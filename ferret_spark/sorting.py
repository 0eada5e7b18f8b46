"""Sort-by-field search (reference: c/src/sort.c, c/src/field_index.c;
goldens ruby/test/unit/search/tc_search_and_sort.rb).

Semantics ported:
- SortField types: integer / float / string / byte / auto (+ SCORE, DOC_ID
  pseudo-fields); reverse flag per field
- missing values (and empty strings, for string sorts) rank as the
  GREATEST value: last under ascending, first under descending
  (deduced from tc_search_and_sort.rb:110-160 golden orders)
- final tie-break: doc_id ascending (the reference appends <DOC>)
- auto type sniffing: integer -> float -> string (field_index.c:34-100)

Spark mapping: the scored hits DataFrame joins the docs table on doc_id,
sort columns get typed casts, then one orderBy — Catalyst's
TakeOrderedAndProject when a limit is present.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE = "<SCORE>"
DOC_ID = "<DOC>"


@dataclass(frozen=True)
class SortField:
    field: str
    type: str = "auto"  # integer|float|string|byte|auto|score|doc_id
    reverse: bool = False

    def to_s(self) -> str:
        if self.type == "score":
            base = "<SCORE>"
            return (f"{self.field}:{base}" if self.field else base) + (
                "!" if self.reverse else ""
            )
        if self.type == "doc_id":
            base = "<DOC>"
            return (f"{self.field}:{base}" if self.field else base) + (
                "!" if self.reverse else ""
            )
        return f"{self.field}:<{self.type}>" + ("!" if self.reverse else "")


SORT_FIELD_SCORE = SortField("", "score")
SORT_FIELD_DOC = SortField("", "doc_id")


def parse_sort(spec) -> list[SortField]:
    """Accepts a SortField, list of SortFields/field-name strings, or a
    sort string like "int DESC, string, SCORE"."""
    if spec is None:
        return [SORT_FIELD_SCORE]
    if isinstance(spec, SortField):
        return [spec]
    if isinstance(spec, str):
        out = []
        for part in spec.split(","):
            ws = part.strip().split()
            if not ws:
                continue
            name = ws[0]
            reverse = len(ws) > 1 and ws[1].upper() == "DESC"
            if name.upper() == "SCORE":
                out.append(SortField("", "score", reverse))
            elif name.upper() in ("DOC", "DOC_ID"):
                out.append(SortField("", "doc_id", reverse))
            else:
                out.append(SortField(name, "auto", reverse))
        return out
    out = []
    for s in spec:
        if isinstance(s, SortField):
            out.append(s)
        else:
            out.append(SortField(str(s), "auto"))
    return out


def sort_to_s(fields: list[SortField]) -> str:
    fl = list(fields)
    if not any(f.type == "doc_id" for f in fl):
        fl = fl + [SORT_FIELD_DOC]
    return "Sort[" + ", ".join(f.to_s() for f in fl) + "]"


def _auto_type(docs: DataFrame, field: str) -> str:
    """Sniff integer -> float -> string over non-null values
    (field_index.c auto semantics)."""
    sample = [
        r[0]
        for r in docs.select(field).where(F.col(field).isNotNull()).limit(50).collect()
    ]
    if not sample:
        return "string"
    def all_match(fn):
        for v in sample:
            try:
                fn(str(v))
            except ValueError:
                return False
        return True
    if all_match(int):
        return "integer"
    if all_match(float):
        return "float"
    return "string"


def sorted_hits(
    index,
    scores: DataFrame,
    sort,
    k: int | None = 10,
    offset: int = 0,
) -> DataFrame:
    """(doc_id, score) hits -> ordered by the Sort spec.
    ``index`` provides .docs for field values."""
    fields = parse_sort(sort)
    docs = index.docs
    # a sort field absent from the docs table behaves as all-null (the
    # reference's field cache yields empty -> everything ties)
    fields = [
        f
        for f in fields
        if f.type in ("score", "doc_id") or f.field in docs.columns
    ] or [SORT_FIELD_DOC]
    need_cols = sorted(
        {f.field for f in fields if f.type not in ("score", "doc_id")}
    )
    df = scores
    if need_cols:
        df = df.join(docs.select("doc_id", *need_cols), "doc_id", "left")
    order = []
    for sf in fields:
        if sf.type == "score":
            col = F.col("score").cast("float")
        elif sf.type == "doc_id":
            col = F.col("doc_id")
        else:
            t = sf.type
            if t == "auto":
                t = _auto_type(docs, sf.field)
            c = F.col(sf.field)
            if t in ("integer", "byte"):
                col = c.cast("long")
            elif t == "float":
                col = c.cast("double")
            else:
                # empty string counts as missing (golden semantics)
                col = F.when(c.cast("string") == "", None).otherwise(
                    c.cast("string")
                )
        if sf.type == "score":
            order.append(col.asc_nulls_last() if sf.reverse else col.desc_nulls_last())
        elif sf.reverse:
            order.append(col.desc_nulls_first())
        else:
            order.append(col.asc_nulls_last())
    order.append(F.col("doc_id").asc())
    out = df.orderBy(*order).select("doc_id", F.col("score").cast("float").alias("score"))
    if offset:
        out = out.offset(offset)
    if k is not None:
        out = out.limit(k)
    return out


def search_sorted(index, q, sort, k: int | None = 10, offset: int = 0) -> DataFrame:
    """Query + Sort -> ordered hits. Works on SegmentIndex (wand path) and
    SparkIndex (declarative path)."""
    from ferret_spark.segments import SegmentIndex

    if isinstance(index, SegmentIndex):
        scores = index.search(q, k=None)
    else:
        from ferret_spark.search import plan_scores, spark_rewrite

        scores = plan_scores(index, spark_rewrite(index, q))
    return sorted_hits(index, scores, sort, k=k, offset=offset)


def scan(index, q, offset: int = 0, limit: int | None = 50) -> DataFrame:
    """search_unscored: matching doc ids in docID order
    (c/src/search.c:1185-1215)."""
    from ferret_spark.segments import SegmentIndex

    if isinstance(index, SegmentIndex):
        hits = index.search(q, k=None).select("doc_id")
    else:
        hits = index.hits_df(q)
    out = hits.orderBy("doc_id")
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_stats(index, q) -> dict:
    """total_hits + max_score (counted during collection in the reference,
    c/src/search.c:1088-1092)."""
    from ferret_spark.segments import SegmentIndex

    if isinstance(index, SegmentIndex):
        scores = index.search(q, k=None)
    else:
        from ferret_spark.search import plan_scores, spark_rewrite

        scores = plan_scores(index, spark_rewrite(index, q))
    row = scores.agg(
        F.count("*").alias("total_hits"),
        F.max(F.col("score").cast("float")).alias("max_score"),
    ).collect()[0]
    return {"total_hits": row["total_hits"], "max_score": row["max_score"]}
