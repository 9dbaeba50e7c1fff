"""Distributed BPE merge learning — the tokenizer-TRAINING slot of a
training-data pipeline (Sennrich-style byte-pair encoding over the
corpus vocabulary), beyond-reference like the rest of the LLM tier.

Design (the classic two-level BPE factorization, distributed):

* the corpus collapses ONCE to its word vocabulary ``(word, count)``
  — a narrow groupby; merge rounds then iterate over the vocabulary,
  never the corpus (at web scale: 10⁹⁺ tokens → 10⁷ distinct words);
* each round is one vectorized pair-count pass over the vocab
  (per-batch polars partials → ``groupby(pair).sum``), a
  deterministic argmax (count desc, then lexicographic pair), and a
  vectorized merge application; the driver holds only the merge list
  — constant state, BSP-style;
* symbols ride as pipe-joined strings (``h|e|l|l|o``); a merge is a
  LITERAL ``replace`` on the double-delimited form
  (``|h||e||l||l||o|``), whose left-to-right non-overlapping
  semantics are identical in polars, Python ``str.replace`` and
  DuckDB ``replace()`` — which is what makes the whole training loop
  SQL-recomputable (:func:`bpe_sql` unrolls the rounds as CTEs, the
  ``_pagerank_sql`` trick applied to tokenizer training).

Vocabulary is restricted to ``[a-z]+`` words so ``|`` can never
collide with a symbol character.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import pyarrow as pa

import ray.data as rd

NUM_MERGES = 8


def _apply_merge(sym: pl.Expr, left: str, right: str) -> pl.Expr:
    w = "|" + sym.str.replace_all("|", "||", literal=True) + "|"
    m = w.str.replace_all(f"|{left}||{right}|", f"|{left}{right}|",
                          literal=True)
    return (m.str.slice(1, m.str.len_chars() - 2)
            .str.replace_all("||", "|", literal=True))


def bpe_train(sf_dir: str, num_merges: int = NUM_MERGES) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    ``(rank, lhs, rhs, n)`` — deterministic (ties broken
    lexicographically), so the unrolled SQL oracle reproduces it
    exactly."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def words(b: pa.Table) -> pa.Table:
        return (pl.from_arrow(b)
                .select(pl.col("text").str.to_lowercase()
                        .str.extract_all(r"[a-z]+").alias("w"))
                .explode("w").drop_nulls("w")
                .group_by("w").len().rename({"len": "n"})
                .with_columns(pl.col("n").cast(pl.Int64))
                .to_arrow())

    vocab = (ds.map_batches(words, batch_format="pyarrow")
             .groupby("w").aggregate(Sum("n", alias_name="n")))

    def to_sym(b: pa.Table) -> pa.Table:
        return (pl.from_arrow(b)
                .select(pl.col("w").str.extract_all(r"[a-z]")
                        .list.join("|").alias("sym"),
                        pl.col("n"))
                .to_arrow())

    vocab = vocab.map_batches(to_sym, batch_format="pyarrow").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):

        def pair_partial(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b).with_columns(
                pl.col("sym").str.split("|").alias("t"))
            df = (df.with_columns(
                      pl.col("t").list.slice(
                          0, pl.col("t").list.len() - 1).alias("lhs"),
                      pl.col("t").list.slice(1).alias("rhs"))
                  .explode(["lhs", "rhs"]).drop_nulls(["lhs", "rhs"])
                  .group_by("lhs", "rhs")
                  .agg(pl.col("n").sum().alias("c")))
            return df.to_arrow()

        pairs = (vocab.map_batches(pair_partial, batch_format="pyarrow")
                 .groupby(["lhs", "rhs"])
                 .aggregate(Sum("c", alias_name="c")))
        top = pairs.sort(["c", "lhs", "rhs"],
                         descending=[True, False, False]).limit(1).take_all()
        if not top:
            break
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
        merges.append((rank, lhs, rhs, c))

        def apply(b: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            return (pl.from_arrow(b)
                    .with_columns(_apply_merge(pl.col("sym"), lhs, rhs)
                                  .alias("sym"))
                    .to_arrow())

        vocab = vocab.map_batches(apply, batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["rank", "lhs", "rhs", "n"])


def bpe_sql(num_merges: int = NUM_MERGES) -> str:
    """Unrolled-CTE recompute of the merge loop (materialized CTEs keep
    DuckDB from re-deriving each round)."""
    parts = ["""WITH v0 AS MATERIALIZED (
    SELECT array_to_string(string_split(w, ''), '|') AS sym,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
          FROM documents)
    GROUP BY w
)"""]
    for r in range(num_merges):
        parts.append(f""", p{r} AS MATERIALIZED (
    SELECT z[1] AS lhs, z[2] AS rhs, CAST(sum(n) AS BIGINT) AS c
    FROM (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z, n
          FROM (SELECT string_split(sym, '|') AS t, n FROM v{r})
          WHERE len(t) > 1)
    GROUP BY z[1], z[2]
), b{r} AS MATERIALIZED (
    SELECT {r} AS rank, lhs, rhs, c AS n
    FROM p{r} ORDER BY c DESC, lhs, rhs LIMIT 1
), v{r + 1} AS MATERIALIZED (
    SELECT replace(substr(m, 2, length(m) - 2), '||', '|') AS sym, n
    FROM (SELECT replace('|' || replace(v.sym, '|', '||') || '|',
                         '|' || b.lhs || '||' || b.rhs || '|',
                         '|' || b.lhs || b.rhs || '|') AS m, v.n
          FROM v{r} v CROSS JOIN b{r} b)
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT rank, lhs, rhs, n FROM b{r}" for r in range(num_merges))
    return "".join(parts) + "\n" + union + "\nORDER BY rank"


BPE_TRAIN_SQL = bpe_sql()
