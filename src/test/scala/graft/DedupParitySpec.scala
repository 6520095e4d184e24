package graft

import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.HashingEmbedder
import graft.operators.{DedupConfig, DedupPipeline}

/** Reference-parity tests for the dedup pipeline against the golden cluster
  * fixture (reference `group_similar` output at threshold 0.90 / split 20,
  * recorded by tools/gen_golden.py).
  */
class DedupParitySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  // ---- fixture -------------------------------------------------------
  private lazy val fixture: (Seq[String], Map[String, String], Seq[Seq[String]]) = {
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/cluster_golden.json"), "UTF-8").mkString
    // minimal JSON parse (fixture shape is fixed; no JSON lib on classpath)
    def strList(a: String): Seq[String] =
      "\"([^\"]*)\"".r.findAllMatchIn(a).map(_.group(1)).toSeq
    val ids = strList(raw.split("\"ids\":", 2)(1).split("]", 2)(0))
    val textsBlock = raw.split("\"texts_b64\":", 2)(1).split("},", 2)(0)
    val texts = "\"(d\\d+)\": \"([^\"]*)\"".r.findAllMatchIn(textsBlock)
      .map(m => m.group(1) -> new String(Base64.getDecoder.decode(m.group(2)), "UTF-8"))
      .toMap
    val groupsBlock = raw.split("\"groups\":", 2)(1)
    val groups = "\\[\\s*(\"d[^\\]]*)\\]".r.findAllMatchIn(groupsBlock)
      .map(m => strList(m.group(1))).toSeq
    (ids, texts, groups)
  }

  /** Exact reference-semantics oracle: all-pairs cosine >= t, BFS components
    * in insertion order (components as *sets* — BFS visit order inside a
    * component is not part of the deterministic contract).
    */
  private def oracleComponents(ids: Seq[String], texts: Map[String, String],
                               t: Double): Seq[Set[String]] = {
    val vecs = ids.map(i => i -> HashingEmbedder.embed(texts(i))).toMap
    val adj = scala.collection.mutable.Map[String, scala.collection.mutable.Set[String]]()
    for (i <- ids.indices; j <- (i + 1) until ids.size) {
      val (a, b) = (ids(i), ids(j))
      if (HashingEmbedder.cosine(vecs(a), vecs(b)) >= t) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
      }
    }
    val visited = scala.collection.mutable.Set[String]()
    val comps = scala.collection.mutable.ArrayBuffer[Set[String]]()
    ids.foreach { seed =>
      if (!visited(seed)) {
        val comp = scala.collection.mutable.Set[String]()
        val q = scala.collection.mutable.Queue(seed)
        while (q.nonEmpty) {
          val c = q.dequeue()
          if (!visited(c)) {
            visited += c; comp += c
            adj.getOrElse(c, Set()).foreach(n => if (!visited(n)) q.enqueue(n))
          }
        }
        if (comp.size >= 2) comps += comp.toSet
      }
    }
    comps.toSeq
  }

  private def pagesDf() = {
    val (ids, texts, _) = fixture
    val spark0 = spark
    import spark0.implicits._
    // constant warc_ts: canonical order (warc_ts desc, url asc) == id order,
    // the reference's insertion order for this fixture
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    ids.map(i => (i, ts, texts(i))).toDF("url", "warc_ts", "text")
  }

  private lazy val result = {
    val r = DedupPipeline.run(spark, pagesDf(), DedupConfig())
      .select("url", "component", "chunk", "cluster_id", "cluster_size", "is_keeper", "n_chars")
      .collect()
    r.map(row => (row.getString(0), row.getString(1), row.getInt(2),
      row.getString(3), row.getLong(4), row.getBoolean(5), row.getInt(6)))
  }

  test("pipeline components equal the exact reference-semantics oracle") {
    val (ids, texts, _) = fixture
    val oracle = oracleComponents(ids, texts, 0.90).map(_.toSet).toSet
    val mine = result.groupBy(_._2).map(_._2.map(_._1).toSet).toSet
    assert(mine == oracle,
      s"components differ: mine=${mine.size} oracle=${oracle.size}\n" +
        s"only-mine=${(mine -- oracle).take(2)}\nonly-oracle=${(oracle -- mine).take(2)}")
  }

  test("dup-pair recall vs reference golden groups is 1.0") {
    val (_, _, groups) = fixture
    val comp = result.map(r => r._1 -> r._2).toMap
    var total = 0
    var hit = 0
    groups.foreach { g =>
      for (i <- g.indices; j <- (i + 1) until g.size) {
        total += 1
        if (comp.get(g(i)).exists(c => comp.get(g(j)).contains(c))) hit += 1
      }
    }
    val recall = hit.toDouble / total
    info(s"dup-pair recall: $hit/$total = $recall")
    assert(recall >= 0.99, s"recall $recall below gate")
  }

  test("reference golden groups line up with oracle components (chunking)") {
    val (ids, texts, groups) = fixture
    val oracle = oracleComponents(ids, texts, 0.90)
    // every golden group is a subset of exactly one oracle component
    groups.foreach { g =>
      val owners = oracle.filter(c => g.forall(c.contains))
      assert(owners.size == 1, s"group $g not inside a unique component")
    }
    // per component, golden chunk sizes = positional split of the size
    oracle.foreach { c =>
      val chunksOf = groups.filter(g => g.forall(c.contains)).map(_.size).sorted
      val expected = (0 until c.size by 20)
        .map(s => math.min(20, c.size - s)).filter(_ >= 2).sorted
      assert(chunksOf == expected, s"component size ${c.size}: $chunksOf vs $expected")
    }
  }

  test("split + keeper invariants match reference semantics") {
    // all clusters sized 2..20; cluster_size consistent; keeper = max n_chars
    val byCluster = result.groupBy(_._4)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.length >= 2 && rows.length <= 20, s"cluster $cid size ${rows.length}")
      assert(rows.forall(_._5 == rows.length))
      val keepers = rows.filter(_._6)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      assert(keepers.head._7 == rows.map(_._7).max, s"cluster $cid keeper not longest")
    }
    // chunks partition each component in canonical order with sizes <= 20
    result.groupBy(_._2).foreach { case (compKey, rows) =>
      val n = rows.length
      val chunkSizes = rows.groupBy(_._3).toSeq.sortBy(_._1).map(_._2.length)
      assert(chunkSizes.forall(_ <= 20), s"component $compKey chunk > 20")
    }
  }

  test("pipeline is deterministic across runs") {
    val again = DedupPipeline.run(spark, pagesDf(), DedupConfig())
      .select("url", "cluster_id", "is_keeper").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).sortBy(_._1)
    assert(again.toSeq == result.map(r => (r._1, r._4, r._6)).sortBy(_._1).toSeq)
  }
}
