"""Generate a driver-STYLE measurement-only scale directory (documents /
embeddings / events — the only tables the contract queries read), mirroring
the distributions observed in the driver's /root/testdata/sf0.1:

- documents: 30-word uniform vocab, token length U[10,100], lang
  {en 41%, zh/es/fr/de ~14.75%}, source = src{doc_id % 20}; 5% of docs are
  near-dup copies of an earlier doc with ONE extra 'dup' token inserted at
  a random position; ~0.16% exact dup texts.
- embeddings: 64-dim unit-norm gaussian, label U{0..9}.
- events: ts uniform over 30 days of 2024-01, user_id U{0..15*sf*1000},
  event_type 5 uniform cats, value ~ exp(mean 50) capped, props '{"k": n}'.

This is for MEASUREMENT ONLY (bench_extra.py / noop isolation); the
correctness oracle always runs on the driver's own sf dirs.

Usage: python scripts/gen_sf.py <out_dir> <multiplier-of-sf0.1>
  e.g. python scripts/gen_sf.py /tmp/sfgen/sf1.0 10
"""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast row the "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    for i in range(n):
        toks = rng.choice(VOCAB, size=lens[i])
        texts.append(" ".join(toks))
    # plant near-dup copies: last 5% of ids replace their text with an
    # earlier doc's text + one inserted 'dup' token
    n_near = n // 20
    bases = rng.choice(n - n_near, size=n_near, replace=False)
    for j in range(n_near):
        tgt = n - n_near + j
        toks = texts[int(bases[j])].split(" ")
        pos = int(rng.integers(0, len(toks) + 1))
        texts[tgt] = " ".join(toks[:pos] + ["dup"] + toks[pos:])
    # a handful of exact dups
    n_exact = max(2, int(n * 0.0016))
    srcs = rng.choice(n - n_near, size=n_exact, replace=False)
    tgts = rng.choice(
        np.setdiff1d(np.arange(n - n_near), srcs), size=n_exact, replace=False
    )
    for s, t in zip(srcs, tgts):
        texts[int(t)] = texts[int(s)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n, p=LANG_P),
            "source": [f"src{i % 20}" for i in range(n)],
            "n_chars": np.int64([len(t) for t in texts]),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    E = rng.standard_normal((n, 64))
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    # driver schema: embedding list<float>, label int32
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(E.astype(np.float32).ravel()), 64
    ).cast(pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": emb,
            "label": pa.array(
                rng.integers(0, 10, size=n).astype(np.int32)
            ),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pd.DataFrame:
    t0 = pd.Timestamp("2024-01-01").value // 1000  # us
    span = (pd.Timestamp("2024-01-31").value - pd.Timestamp("2024-01-01").value) // 1000
    ts = np.sort(t0 + (rng.random(n) * span).astype(np.int64))
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["signup", "purchase", "view", "click", "error"], size=n
            ),
            "value": np.round(
                np.minimum(rng.exponential(50.0, size=n), 560.0), 2
            ),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
        }
    )


def main() -> None:
    out = sys.argv[1]
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)
    n_docs = int(5000 * mult)
    n_emb = int(2000 * mult)
    n_ev = int(100000 * mult)
    gen_documents(rng, n_docs).to_parquet(
        f"{out}/documents.parquet", index=False
    )
    pq.write_table(gen_embeddings(rng, n_emb), f"{out}/embeddings.parquet")
    gen_events(rng, n_ev, n_users=int(1500 * mult)).to_parquet(
        f"{out}/events.parquet", index=False
    )
    print(f"wrote {out}: docs={n_docs} emb={n_emb} events={n_ev}")


if __name__ == "__main__":
    main()
