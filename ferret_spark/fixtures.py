"""Deterministic fixtures.

1. The 18-doc golden search corpus ported from the reference
   (SEARCH_TEST_DOCS, ruby/test/unit/index/th_doc.rb:281-331; same data in
   c/test/test_search.c:161-230).
2. A deterministic synthetic source-code corpus with the BASELINE.json
   input_hint shape (repo, path, commit, lang, content), seed=42,
   Zipf(s=1.1) token draw, lognormal(mu, sigma) lengths — FIXTURES.md §1/§6.
   Generation is per-row deterministic (Philox keyed by (seed, row)) so the
   same rows appear regardless of partitioning, and is distributed via
   mapInArrow when materialized as a Spark DataFrame.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

# (date, category, number, field/content) — th_doc.rb:281-331
SEARCH_TEST_DOCS = [
    ("20050930", "cat1/", "0.123", "word1"),
    ("20051001", "cat1/sub1", "0.954", "word1 word2 the quick brown fox"),
    ("20051002", "cat1/sub1/subsub1", "908.125", "word1 word3"),
    ("20051003", "cat1/sub2", "3999", "word1 word3"),
    ("20051004", "cat1/sub2/subsub2", "+.3412", "word1 word2"),
    ("20051005", "cat2/sub1", "-1.298", "word1"),
    ("20051006", "cat2/sub1", "2", "word1 word3"),
    ("20051007", "cat2/sub1", "+8.894", "word1"),
    ("20051008", "cat2/sub1", "+21235.2135", "word1 word2 word3 the fast brown fox"),
    ("20051009", "cat3/sub1", "10.0", "word1"),
    ("20051010", "cat3/sub1", "1", "word1"),
    ("20051011", "cat3/sub1", "-12518419", "word1 word3 the quick red fox"),
    ("20051012", "cat3/sub1", "10", "word1"),
    ("20051013", "cat1/sub2", "15682954", "word1"),
    ("20051014", "cat1/sub1", "91239", "word1 word3 the quick hairy fox"),
    ("20051015", "cat1/sub2/subsub1", "-.89321", "word1"),
    ("20051016", "cat1/sub1/subsub2", "-89",
     "word1 the quick fox is brown and hairy and a little red"),
    ("20051017", "cat1/", "-1.0", "word1 the brown fox is quick and red"),
]


def golden_rows() -> list[dict]:
    """Golden corpus rows in both the native (date/category/number/content)
    and the corpus (repo/path/commit/lang/content) shapes — FIXTURES.md §2."""
    rows = []
    for i, (date, cat, num, content) in enumerate(SEARCH_TEST_DOCS):
        rows.append(
            {
                "repo": "golden/search",
                "path": cat,
                "commit": hashlib.sha1(
                    f"golden|{i}|{content}".encode()
                ).hexdigest(),
                "lang": "txt",
                "content": content,
                "date": date,
                "category": cat,
                "number": num,
            }
        )
    return rows


GOLDEN_FIELD_CONFIG = {
    "content": "whitespace",
    "category": "keyword",
    "date": "keyword",
    "number": "keyword",
}


# ---------------------------------------------------------------------------
# Synthetic source-code corpus (FIXTURES.md §1)

LANGS = ["py", "rb", "c", "java", "js", "go"]

_KEYWORDS = (
    "def class return import if else elif for while break continue pass "
    "lambda yield try except finally raise with as assert global print "
    "public private static void int float double char struct typedef "
    "const unsigned signed long short enum union switch case default goto "
    "func package interface chan select defer go map range type var "
    "module require include namespace using template typename new delete "
    "this self super nil null none true false end begin do then fn let mut "
    "match impl trait pub crate async await spawn"
).split()


def build_vocab(size: int = 10000) -> list[str]:
    """Code-like token vocabulary: keywords, identifiers, numbers,
    hyphen/underscore compounds. Deterministic."""
    vocab: list[str] = list(_KEYWORDS)
    i = 0
    while len(vocab) < size:
        k = i % 7
        if k == 0:
            vocab.append(f"var_{i}")
        elif k == 1:
            vocab.append(f"fn{i}")
        elif k == 2:
            vocab.append(f"get_{_KEYWORDS[i % len(_KEYWORDS)]}_{i}")
        elif k == 3:
            vocab.append(str(1000 + i))
        elif k == 4:
            vocab.append(f"multi-part-{i}")
        elif k == 5:
            vocab.append(f"ClassName{i}")
        else:
            vocab.append(f"x{i}")
        i += 1
    return vocab[:size]


_VOCAB = None
_ZIPF_CDF = None


def _vocab_and_probs(vocab_size: int = 10000, s: float = 1.1):
    """Vocab + Zipf cumulative distribution (sampling via inverse-CDF
    searchsorted — O(log V) per token instead of rng.choice's O(V))."""
    global _VOCAB, _ZIPF_CDF
    if _VOCAB is None or len(_VOCAB) != vocab_size:
        _VOCAB = np.array(build_vocab(vocab_size), dtype=object)
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        p = 1.0 / np.power(ranks, s)
        _ZIPF_CDF = np.cumsum(p / p.sum())
    return _VOCAB, _ZIPF_CDF


def synth_rows(
    start: int,
    end: int,
    mu: float = 5.5,
    sigma: float = 1.0,
    vocab_size: int = 10000,
    max_tokens: int = 10000,
) -> pd.DataFrame:
    """Rows [start, end) of the synthetic corpus — per-row deterministic.

    Each row i draws from Philox(key=SEED, counter derived from i), so any
    partitioning of the id range yields identical rows (required for the
    N-vs-4N scaling run to index the exact same input).
    """
    vocab, cdf = _vocab_and_probs(vocab_size)
    n = end - start
    repos = np.array([f"org{i % 7}/repo{i % 23}" for i in range(start, end)])
    langs = np.array([LANGS[i % len(LANGS)] for i in range(start, end)])
    contents = np.empty(n, dtype=object)
    paths = np.empty(n, dtype=object)
    commits = np.empty(n, dtype=object)
    for j, i in enumerate(range(start, end)):
        rng = np.random.Generator(np.random.Philox(key=SEED, counter=i))
        ln = int(min(max(1, round(rng.lognormal(mu, sigma))), max_tokens))
        idx = np.searchsorted(cdf, rng.random(ln))
        idx = np.minimum(idx, vocab_size - 1)
        toks = vocab[idx]
        # sprinkle newlines/punctuation deterministically
        parts = []
        for t_i, t in enumerate(toks):
            parts.append(t)
            parts.append("\n" if (t_i % 12) == 11 else " ")
        contents[j] = "".join(parts[:-1])
        w1, w2 = vocab[idx[0] % vocab_size], vocab[idx[-1] % vocab_size]
        paths[j] = f"src/{w1}/{w2}.{langs[j]}"
        commits[j] = hashlib.sha1(
            f"{repos[j]}|{paths[j]}|{i}|{SEED}".encode()
        ).hexdigest()
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def synth_corpus_df(
    spark,
    n_rows: int,
    num_partitions: int = 32,
    start: int = 0,
    with_id: bool = False,
    **kw,
):
    """Distributed deterministic corpus as a Spark DataFrame.

    Generation happens executor-side via mapInArrow over an id range —
    no driver materialization, scales linearly with partitions. ``start``
    offsets the global row range (batched largefile builds generate
    DISTINCT slices); ``with_id`` adds the global row id as ``doc_id``.
    """
    import numpy as np
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if len(ids) == 0:
                continue
            lo, hi = int(ids.min()), int(ids.max()) + 1
            pdf = synth_rows(lo, hi, **kw)
            if with_id:
                pdf.insert(0, "doc_id", np.arange(lo, hi, dtype="int64"))
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    schema = ("doc_id long, " + CORPUS_SCHEMA) if with_id else CORPUS_SCHEMA
    rng_df = spark.range(start, start + n_rows, 1, num_partitions)
    return rng_df.mapInArrow(gen, schema)


def synth_corpus_pdf(n_rows: int, **kw) -> pd.DataFrame:
    """Local pandas version (tests / oracle)."""
    return synth_rows(0, n_rows, **kw)
