"""Long/non-ASCII-document cost law for the ExactSubstr pair.

The round-13 verdict flagged both ``duplicate_substring_spans`` and
``remove_duplicate_substrings`` as quadratic per document on exactly
the corpus they exist for (MB-scale web-crawl text): per-offset
``substring(txt, i, L)`` is an O(i) UTF-8 leading-byte scan for
non-ASCII text, and the removal's per-char ``exists``-over-matches
rebuild is O(len * matches).  The round-14 fix (``_char_window_fps``
slice windows + interval-complement rebuild) makes both
O(len * L + matches) per doc.

This bench pins that cost law empirically: synthetic corpora of a few
documents each, doc length doubling 12.5k -> 200k chars, ~20%
duplicated mass (repeated 200-char runs shared across docs — so
matches grows with len too, the removal's former worst axis), with a
2-byte char (é) and a 4-byte char (\U0001d11e) mixed in so substring's
non-ASCII slow path would show if it were still there.  Prints one
JSON line per size with per-Mchar seconds; PASS = the per-Mchar cost
of the largest size is < 2x the smallest (linear within noise; the
quadratic shapes blow this up ~16x over a 16x size sweep).

Usage: python tools/substr_longdoc_bench.py [sizes_chars ...]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dax_ppdb_spark.session import get_spark  # noqa: E402

ALPHABET = "abcdefgh é\U0001d11e"
N_DOCS = 4
DUP_RUN = 200
MIN_LEN = 30


def make_corpus(rng: random.Random, doc_len: int) -> list[tuple[int, str]]:
    """N_DOCS docs of ~doc_len chars, ~20% duplicated mass via
    200-char runs repeated within and across docs."""
    shared = ["".join(rng.choice(ALPHABET) for _ in range(DUP_RUN)) for _ in range(8)]
    docs = []
    for d in range(N_DOCS):
        parts, n = [], 0
        while n < doc_len:
            if rng.random() < 0.2:  # ~20% duplicated mass
                p = rng.choice(shared)
            else:
                p = "".join(rng.choice(ALPHABET) for _ in range(DUP_RUN))
            parts.append(p)
            n += len(p)
        docs.append((d, "".join(parts)[:doc_len]))
    return docs


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [12_500, 25_000, 50_000, 100_000, 200_000]
    spark = get_spark(app_name="substr_longdoc_bench")
    from dax_ppdb_spark.llm.dedup import (
        duplicate_substring_spans,
        remove_duplicate_substrings,
    )

    rng = random.Random(14)
    rows = []
    for doc_len in sizes:
        corpus = make_corpus(rng, doc_len)
        docs = spark.createDataFrame(corpus, "doc_id LONG, text STRING").cache()
        docs.count()
        mchars = N_DOCS * doc_len / 1e6
        rec = {"doc_len": doc_len, "mchars": round(mchars, 3)}
        for name, fn in (
            ("spans", duplicate_substring_spans),
            ("removal", remove_duplicate_substrings),
        ):
            best = min(
                _timed(fn, docs) for _ in range(2)
            )
            rec[f"{name}_sec"] = round(best, 3)
            rec[f"{name}_sec_per_mchar"] = round(best / mchars, 3)
        docs.unpersist()
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    verdicts = {}
    for name in ("spans", "removal"):
        lo = rows[0][f"{name}_sec_per_mchar"]
        hi = rows[-1][f"{name}_sec_per_mchar"]
        verdicts[name] = {"growth_per_mchar": round(hi / lo, 2), "pass": hi < 2 * lo}
    print(json.dumps({"verdict": verdicts}), flush=True)
    return 0 if all(v["pass"] for v in verdicts.values()) else 1


def _timed(fn, docs) -> float:
    t0 = time.monotonic()
    fn(docs, min_len=MIN_LEN).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


if __name__ == "__main__":
    sys.exit(main())
