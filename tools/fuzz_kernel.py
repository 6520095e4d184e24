#!/usr/bin/env python3
"""Fuzz the Scala kernel against the reference's pure functions.

Generates randomized HTML documents (tags, script/style blocks, entity refs,
unicode, malformed fragments) and URLs, pipes them through the packaged
Scala CLI (graft.CrossCheck), and diffs against the reference implementation
loaded from /root/reference. Exit 0 = all N cases byte-identical.

Usage: python3 tools/fuzz_kernel.py <scala_output.tsv mode: gen|check> ...
  gen   N SEED > cases.tsv     emit 'op\tb64' lines
  check cases.tsv results.txt  compare scala results vs reference
"""
import base64
import random
import sys

sys.path.insert(0, "/root/repo/tools")
from gen_golden import cleaning, language, embedder  # noqa: E402  (loads reference)

b64 = lambda s: base64.b64encode(s.encode("utf-8")).decode()
b64d = lambda s: base64.b64decode(s).decode("utf-8")

TAGS = ["p", "div", "span", "b", "i", "a href='x'", "img src=1", "br/", "table", "td"]
ENTS = ["&amp;", "&lt;", "&nbsp;", "&copy", "&copy;", "&notit;", "&notin;", "&#65;",
        "&#x1F600;", "&#xD800;", "&#0;", "&#12;", "&frac12;", "&CounterClockwiseContourIntegral;",
        "&unknown;", "&amp", "&ampx", "&#999999999999;", "&gt", "&GT"]
WORDS = ("alpha beta gamma delta привет мир текст čćž šđ hello world data "
         "spark engine dedup cluster page crawl web").split()
WS = [" ", "\t", "\n", "\r\n", " ", " ", "  ", "\x0b"]


def rand_html(rnd):
    parts = []
    for _ in range(rnd.randrange(1, 60)):
        r = rnd.random()
        if r < 0.35:
            parts.append(rnd.choice(WORDS))
        elif r < 0.5:
            t = rnd.choice(TAGS)
            parts.append(f"<{t}>")
        elif r < 0.6:
            parts.append(f"</{rnd.choice(TAGS).split()[0]}>")
        elif r < 0.7:
            parts.append(rnd.choice(ENTS))
        elif r < 0.8:
            parts.append(rnd.choice(WS))
        elif r < 0.9:
            tag = rnd.choice(["script", "SCRIPT", "style", "StYlE"])
            body = " ".join(rnd.choice(WORDS) for _ in range(rnd.randrange(0, 6)))
            parts.append(f"<{tag} a=1>{body}</{tag.lower() if rnd.random() < 0.5 else tag}>")
        else:
            parts.append(rnd.choice(["<", ">", "<x", "x>", "<!---->", "<!-- c -->"]))
    return "".join(parts)


def rand_url(rnd):
    scheme = rnd.choice(["http", "https", "HTTPS", "ftp", "", "weird+s.1"])
    host = rnd.choice(["Example.COM", "a.b.c", "x.io:8080", "h.com:443", "h.com:80", ""])
    path = rnd.choice(["", "/", "/a/b", "//x//y", "/p;param", "/%20enc"])
    q = rnd.choice(["", "?b=2&a=1", "?&&x=1&&", "?single", "?z=9&y=8&a"])
    frag = rnd.choice(["", "#f", "#"])
    pre = rnd.choice(["", " ", "  \t"])
    post = rnd.choice(["", " ", "\n"])
    base = f"{scheme}://{host}" if scheme and host else (f"//{host}" if host else "")
    return f"{pre}{base}{path}{q}{frag}{post}"


def main():
    mode = sys.argv[1]
    if mode == "gen":
        n, seed = int(sys.argv[2]), int(sys.argv[3])
        rnd = random.Random(seed)
        for _ in range(n):
            op = rnd.choice(["extract", "extract", "canon", "urlhash", "domain", "lang", "embed"])
            if op in ("canon", "urlhash", "domain"):
                payload = rand_url(rnd)
            elif op == "lang":
                payload = " ".join(rnd.choice(WORDS) for _ in range(rnd.randrange(0, 10)))
            elif op == "embed":
                payload = " ".join(rnd.choice(WORDS) for _ in range(rnd.randrange(0, 30)))
            else:
                payload = rand_html(rnd)
            print(f"{op}\t{b64(payload)}")
    elif mode == "check":
        import struct
        cases = [l.rstrip("\n").split("\t") for l in open(sys.argv[2]) if l.strip()]
        results = open(sys.argv[3]).read().split("\n")
        if results and results[-1] == "":
            results.pop()
        assert len(cases) == len(results), f"{len(cases)} cases vs {len(results)} results"
        emb = embedder.HashingEmbedder(model_name="hashing")
        bad = 0
        for i, ((op, pb), got) in enumerate(zip(cases, results)):
            payload = b64d(pb)
            if op == "extract":
                want = b64(cleaning.html_to_text(payload))
            elif op == "canon":
                want = b64(cleaning.canonicalize_url(payload))
            elif op == "urlhash":
                want = cleaning.url_hash(payload)
            elif op == "domain":
                want = b64(cleaning.extract_domain(payload))
            elif op == "lang":
                want = language.detect_language(payload)
            elif op == "embed":
                v = emb._embed_single(payload)
                want = struct.pack("<384f", *v).hex()
            else:
                raise ValueError(op)
            if want != got:
                bad += 1
                print(f"MISMATCH case {i} op={op} payload={payload!r}")
                print(f"  want={want[:120]}")
                print(f"  got ={got[:120]}")
                if bad > 5:
                    break
        if bad:
            sys.exit(1)
        print(f"OK: {len(cases)} fuzz cases byte-identical")


if __name__ == "__main__":
    main()
