#!/usr/bin/env python3
"""Generate golden parity fixtures for the Scala kernel ports.

Loads the reference's pure-stdlib modules (cleaning, language, embedder,
cluster) by file path and records their outputs on a battery of inputs.
Also dumps the Python stdlib HTML5 entity tables (public WHATWG data) used
by html.unescape, so the Scala unescape can match byte-for-byte.

Outputs land in:
  src/main/resources/graft/   (runtime data: entity tables, ws classes)
  src/test/resources/graft/   (golden test fixtures)
"""
import base64
import hashlib
import html
import importlib.util
import json
import os
import re
import struct
import sys

# Byte-reproducible fixtures: the reference's group_similar iterates sets/
# dicts whose order depends on PYTHONHASHSEED, so an unpinned run makes
# every fixture refresh an unauditable diff (round-4 ADVICE finding).
# Re-exec once with the seed pinned before anything imports the reference.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src/news_recap"
RES_MAIN = os.path.join(REPO, "src/main/resources/graft")
RES_TEST = os.path.join(REPO, "src/test/resources/graft")
os.makedirs(RES_MAIN, exist_ok=True)
os.makedirs(RES_TEST, exist_ok=True)


def load(name, path, register=None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # dataclass slots resolution needs this
    if register:
        sys.modules[register] = mod
    spec.loader.exec_module(mod)
    return mod


cleaning = load("ref_cleaning", f"{REF}/ingestion/cleaning.py")
language = load("ref_language", f"{REF}/ingestion/language.py")
embedder = load("ref_embedder", f"{REF}/recap/dedup/embedder.py",
                register="news_recap.recap.dedup.embedder")
# cluster.py imports news_recap.recap.dedup.embedder — satisfied above
sys.modules.setdefault("news_recap", type(sys)("news_recap"))
cluster = load("ref_cluster", f"{REF}/recap/dedup/cluster.py")

b64 = lambda s: base64.b64encode(s.encode("utf-8")).decode("ascii")

# ---------------------------------------------------------------- entities
from html.entities import html5
with open(f"{RES_MAIN}/html5_entities.tsv", "w") as f:
    for name in sorted(html5):
        cps = " ".join(f"{ord(c):x}" for c in html5[name])
        f.write(f"{name}\t{cps}\n")

import html as _html_mod
inv_charrefs = _html_mod._invalid_charrefs
inv_codepoints = _html_mod._invalid_codepoints
with open(f"{RES_MAIN}/invalid_charrefs.tsv", "w") as f:
    for num in sorted(inv_charrefs):
        cps = " ".join(f"{ord(c):x}" for c in inv_charrefs[num])
        f.write(f"{num:x}\t{cps}\n")
with open(f"{RES_MAIN}/invalid_codepoints.txt", "w") as f:
    f.write("\n".join(f"{n:x}" for n in sorted(inv_codepoints)) + "\n")

# Python re \s character set (probe) and str.strip() whitespace set
ws_re = sorted(c for c in range(0x10000) if re.match(r"\s", chr(c)))
ws_strip = sorted(c for c in range(0x10000) if chr(c).isspace())
with open(f"{RES_MAIN}/ws_regex.txt", "w") as f:
    f.write("\n".join(f"{c:x}" for c in ws_re) + "\n")
with open(f"{RES_MAIN}/ws_strip.txt", "w") as f:
    f.write("\n".join(f"{c:x}" for c in ws_strip) + "\n")

# ---------------------------------------------------------------- extract
html_cases = [
    "",
    "plain text no markup",
    "<p>Hello <b>world</b></p>",
    "<SCRIPT type='x'>var a = '<p>no</p>';</SCRIPT>visible",
    "<style media=\"x\">.a { color: red }</style><div>body</div>",
    "<script>a</script><script>b</script>keep<style>c</style>",
    "<ScRiPt\n attr=1>multi\nline\njunk</sCrIpT>after",
    "a   b\t\tc\nd\r\ne\x0bf",
    "&amp; &lt; &gt; &quot; &#39; &nbsp; done",
    "&amp &ampx &notit; &notin; &#65; &#x41; &#X41 &#1234567890; &#xD800; &#0; &#13;",
    "&CounterClockwiseContourIntegral; &aleph;&Aacute&aacute",
    "text &unknown; &; & plain &#; &#x;",
    "<p>caf&eacute; r&eacute;sum&eacute;</p>",
    "<div class='x' data-a=\"<\">angle in attr</div>",
    "<br/><br />self closing<img src='x'>",
    "nested <div><p>deep <span>text</span></p></div> end",
    " leading nbsp&nbsp;and line sep　ideographic",
    "<script>no close tag",
    "<p>unterminated <tag",
    "пример текста на русском <b>жирный</b>",
    "srpski tekst čćžšđ <i>kurziv</i>",
    "mixed &frac12; &frac34; &times; &divide; &mdash;&ndash;",
    "&lt;script&gt;alert(1)&lt;/script&gt;",
    "A" * 50 + "<style>x</style>" + "B" * 50,
    "&gt&gt;&GT&GT;",  # semicolon-less legacy entities
    "&notareal &copy &copyx &copy;x",
]
with open(f"{RES_TEST}/extract_golden.tsv", "w") as f:
    for i, h in enumerate(html_cases):
        t = cleaning.html_to_text(h)
        f.write(f"{i}\t{b64(h)}\t{b64(t)}\n")

clean_cases = [
    # (content_html, summary_html, max_chars)
    (None, None, 12000),
    ("<p>" + "word " * 200 + "</p>", "<p>short</p>", 12000),   # long content
    ("<p>short content</p>", "<p>sum</p>", 12000),
    ("x" * 699, None, 12000),
    ("x" * 700, None, 12000),
    ("c" * 300, "s" * 101, 12000),   # content < summary+200
    ("c" * 301, "s" * 101, 12000),   # content >= summary+200
    (None, "<p>only summary</p>", 12000),
    ("a b " * 40, None, 50),          # truncate + rstrip
    ("<b>tag</b> " * 30, "ss", 20),
    ("", "", 12000),
    ("<p>exact</p>", None, 5),
]
with open(f"{RES_TEST}/clean_golden.tsv", "w") as f:
    for i, (c, s, mc) in enumerate(clean_cases):
        r = cleaning.clean_article_text(content_html=c, summary_html=s, max_chars=mc)
        f.write("\t".join([
            str(i), b64(c or "\0NULL"), b64(s or "\0NULL"), str(mc),
            b64(r.text), str(int(r.is_truncated)), str(int(r.is_full_content)),
            str(int(r.needs_enrichment)),
        ]) + "\n")

# ---------------------------------------------------------------- urls
url_cases = [
    "HTTPS://Example.com:443/news?id=2&a=1#fragment",
    "http://example.com:80/path",
    "http://example.com:8080/path",
    "https://example.com:8443/a",
    "example.com/relative",
    "//host.com/protocol-relative",
    "https://a.b//double//slash///x",
    "https://a.b",
    "https://a.b/?z=1&a=2&m=3",
    "https://a.b/?&&a=1&&",
    "  https://spaces.com/x  ",
    "ftp://files.example.com/f.txt",
    "https://UPPER.CASE/Path/Is/Kept",
    "https://u:p@host.com:443/auth",
    "https://host.com/x;params?q=1#frag",
    "https://host.com/search?q=a+b&q=a%20b",
    "http://host.com",
    "https://host.com/?single",
]
with open(f"{RES_TEST}/urlcanon_golden.tsv", "w") as f:
    for i, u in enumerate(url_cases):
        c = cleaning.canonicalize_url(u)
        h = cleaning.url_hash(u)
        d = cleaning.extract_domain(u)
        f.write(f"{i}\t{b64(u)}\t{b64(c)}\t{h}\t{b64(d)}\n")

# ---------------------------------------------------------------- language
lang_cases = [
    ("", ""),
    ("hello world this is english", ""),
    ("пример текста на русском языке", ""),
    ("ovo je srpski tekst sa č ć ž", ""),
    ("ово је ћирилични српски текст", ""),
    ("просто кириллица без маркеров", ""),
    ("текст с буквой ы вот", ""),
    ("12345 67890 !!!", ""),
    ("hello", "Привет"),
    ("mixed latin and кириллица эх", ""),
    ("đačka sveska", ""),
    ("touché café", ""),
]
with open(f"{RES_TEST}/lang_golden.tsv", "w") as f:
    for i, (t, title) in enumerate(lang_cases):
        f.write(f"{i}\t{b64(t)}\t{b64(title)}\t{language.detect_language(t, title)}\n")

# ---------------------------------------------------------------- embedder
emb = embedder.HashingEmbedder(model_name="hashing")
emb_cases = [
    "",
    "a",
    "ab",
    "abc",
    "hello world",
    "The quick brown fox jumps over the lazy dog",
    "  Leading and trailing   ",
    "ПрИвЕт МиР кириллица",
    "čćžšđ unicode",
    "word " * 500,
    "x" * 3,
    "numbers 123 456 789 !@#",
]
with open(f"{RES_TEST}/embedder_golden.tsv", "w") as f:
    for i, t in enumerate(emb_cases):
        v = emb._embed_single(t)
        hexv = struct.pack("<384f", *[struct.unpack("<f", struct.pack("<f", x))[0] for x in v]).hex()
        f.write(f"{i}\t{b64(t)}\t{hexv}\n")

cos_pairs = [
    ("hello world", "hello world"),
    ("hello world", "hello there world"),
    ("the quick brown fox", "a completely different sentence"),
    ("word " * 100, "word " * 99 + "other "),
    ("пример текста", "пример текста на русском"),
]
with open(f"{RES_TEST}/cosine_golden.tsv", "w") as f:
    for i, (a, b) in enumerate(cos_pairs):
        va, vb = emb._embed_single(a), emb._embed_single(b)
        c = embedder.cosine_similarity(va, vb)
        f.write(f"{i}\t{b64(a)}\t{b64(b)}\t{struct.pack('<d', c).hex()}\n")

# ---------------------------------------------------------------- cluster
# Synthetic corpus with known near-dup structure; groups via reference
# group_similar at threshold 0.90 over HashingEmbedder vectors.
import random
rnd = random.Random(1234)
VOCAB = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu").split()

def make_doc(n):
    return " ".join(rnd.choice(VOCAB) for _ in range(n))

def mutate(t, n_ops):
    toks = t.split()
    for _ in range(n_ops):
        i = rnd.randrange(len(toks))
        op = rnd.random()
        if op < 0.4:
            toks[i] = rnd.choice(VOCAB)
        elif op < 0.7 and len(toks) > 5:
            del toks[i]
        else:
            toks.insert(i, rnd.choice(VOCAB))
    return " ".join(toks)

docs = {}
idx = 0
# 8 seed docs, each with a family of near-dups (sizes 1..30 to hit the >20 split)
for fam, famsize in enumerate([1, 2, 3, 5, 8, 12, 25, 30]):
    seed = make_doc(120)
    docs[f"d{idx:04d}"] = seed; idx += 1
    for _ in range(famsize - 1):
        docs[f"d{idx:04d}"] = mutate(seed, rnd.randrange(1, 6)); idx += 1
# 20 unrelated singletons
for _ in range(20):
    docs[f"d{idx:04d}"] = make_doc(100); idx += 1

ids = sorted(docs)  # canonical insertion order
vecs = {i: emb._embed_single(docs[i]) for i in ids}
groups = cluster.group_similar(ids, vecs, 0.90, max_group_size=20)
with open(f"{RES_TEST}/cluster_golden.json", "w") as f:
    json.dump({
        "threshold": 0.90,
        "max_group_size": 20,
        "ids": ids,
        "texts_b64": {i: b64(docs[i]) for i in ids},
        "groups": groups,
    }, f, indent=1)

print(file=sys.stderr, *["wrote fixtures:",
      len(html_cases), "extract,", len(clean_cases), "clean,",
      len(url_cases), "url,", len(lang_cases), "lang,",
      len(emb_cases), "embed,", len(groups), "golden groups over", len(ids), "docs"])

# ---------------------------------------------------------------- external id
rss = load("ref_rss_idonly", None) if False else None
# _build_external_id is module-level in rss.py but rss.py imports heavy deps;
# replicate via the same stdlib calls it makes (json/hashlib) to produce the
# golden expectations:
import json as _json
def _ref_external_id(feed_url, guid, link, title, raw_published_at):
    if guid and guid.strip():
        prefix = hashlib.sha1(feed_url.encode("utf-8")).hexdigest()[:10]
        return f"{prefix}:{guid.strip()}"
    raw = _json.dumps({
        "feed_url": feed_url, "link": link, "title": title,
        "raw_published_at": (raw_published_at or "").strip(),
    }, sort_keys=True, ensure_ascii=True)
    return "generated:" + hashlib.sha1(raw.encode("utf-8")).hexdigest()

extid_cases = [
    ("https://feed.example/rss", "guid-123", "https://x/1", "Title", "2026-01-01"),
    ("https://feed.example/rss", "  padded-guid  ", "https://x/2", "T", None),
    ("https://feed.example/rss", None, "https://x/3", "Some Title", "Mon, 01 Jan 2026"),
    ("https://feed.example/rss", "", "https://x/4", 'quotes "and" \\ slash', None),
    ("https://другой.пример/rss", None, "https://x/5", "Кириллица заголовок", "  "),
    ("https://feed.example/rss", None, "https://x/6", "tab\there\nnewline", "raw"),
]
with open(f"{RES_TEST}/extid_golden.tsv", "w") as f:
    for i, (fu, g, l, t, rp) in enumerate(extid_cases):
        eid = _ref_external_id(fu, g, l, t, rp)
        f.write("\t".join([str(i), b64(fu), b64(g if g is not None else "\0N"),
                           b64(l), b64(t), b64(rp if rp is not None else "\0N"), eid]) + "\n")
print("extid golden written", file=sys.stderr)
