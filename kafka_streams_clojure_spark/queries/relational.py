"""Stateless relational query keys (SURVEY.md §2.1, §2.2, §2.7).

Each key exercises one operator of the reference surface through the
combinator layer (`kafka_streams_clojure_spark.xform`), with a DuckDB
oracle. The flagship shapes mirror the reference's own examples:
filter -> map -> filter pipelines (README.md:80-82) and first-match
``branch`` fan-out (api.clj:62-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark import xform as X
from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import load_table


@query(
    "q_scan_source",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    """,
)
def q_scan_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan + projection (reference `stream`, api.clj:57-60).

    Column pruning reaches the parquet scan: ReadSchema carries only
    the four projected columns.
    """
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "q_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase' AND value > 50.0
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(filter pred)` transducer (reference README.md:80). The
    predicate is pushed down into the parquet scan by Catalyst."""
    ev = load_table(spark, sf_dir, "events")
    pipe = X.compose(
        X.filter_((F.col("event_type") == "purchase") & (F.col("value") > 50.0)),
        X.map_("event_id", "user_id", "event_type", "value"),
    )
    return pipe(ev)


@query(
    "q_filter_not",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE NOT (event_type = 'view' OR value > 90.0)
    """,
)
def q_filter_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(remove pred)` — inverse filter."""
    ev = load_table(spark, sf_dir, "events")
    pipe = X.compose(
        X.remove((F.col("event_type") == "view") | (F.col("value") > 90.0)),
        X.map_("event_id", "user_id", "event_type"),
    )
    return pipe(ev)


@query(
    "q_project_map",
    oracle="""
    SELECT event_type AS key, user_id AS value
    FROM events
    WHERE value >= 10.0
    """,
)
def q_project_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(map f)` over [k v] — the reference's flagship example swaps key
    and value (README.md:81); here the record (key=user_id,
    value=event_type) is swapped, composed with a filter exactly like
    the reference's filter∘map pipeline."""
    ev = load_table(spark, sf_dir, "events")
    pipe = X.compose(
        X.filter_(F.col("value") >= 10.0),
        X.map_(key=F.col("event_type"), value=F.col("user_id")),
    )
    return pipe(ev)


@query(
    "q_map_values",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value * 0.9 AS value, props
    FROM events
    """,
)
def q_map_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream `mapValues` parity (README.md:68-70): rewrite the value
    column in place, all other columns (the "key side") untouched —
    no re-key, hence no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return X.map_values(value=F.col("value") * 0.9)(ev)


@query(
    "q_select_key",
    oracle="""
    SELECT event_type || '#' || CAST(user_id AS VARCHAR) AS key,
           event_id, value
    FROM events
    """,
)
def q_select_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`key-value-mapper` re-key adapter (api.clj:96-100). The shuffle
    the new key implies is deferred to the next keyed operator."""
    ev = load_table(spark, sf_dir, "events")
    rekeyed = X.select_key(F.concat_ws("#", F.col("event_type"), F.col("user_id")))(ev)
    return rekeyed.select("key", "event_id", "value")


@query(
    "q_keep_nonnull",
    oracle="""
    SELECT event_id, big_value FROM (
      SELECT event_id, CASE WHEN value > 75.0 THEN value END AS big_value
      FROM events
    ) WHERE big_value IS NOT NULL
    """,
)
def q_keep_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(keep f)` — map then drop nil results."""
    ev = load_table(spark, sf_dir, "events")
    return X.keep(F.when(F.col("value") > 75.0, F.col("value")), "big_value", "event_id")(ev)


@query(
    "q_flatmap_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def q_flatmap_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(mapcat f)` / KStream `flatMap`: one row -> N rows. Tokenize
    documents; explode stays inside codegen (no Python)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.flat_map(F.split(F.col("text"), " "), "token", "doc_id")(docs)


@query(
    "q_flatmap_values",
    oracle="""
    SELECT event_id, user_id, unnest([value, value * 2.0]) AS v
    FROM events
    """,
)
def q_flatmap_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream `flatMapValues`: explode the value side, keys carried."""
    ev = load_table(spark, sf_dir, "events")
    return X.flat_map_values(
        F.array(F.col("value"), F.col("value") * 2.0), "v", "event_id", "user_id"
    )(ev)


_BRANCH_ORACLE = """
    SELECT event_id, event_type, value,
           CASE WHEN event_type = 'error' THEN {b0}
                WHEN value > 90.0 THEN {b1}
                WHEN event_type = 'purchase' THEN {b2}
           END AS branch
    FROM events
    WHERE event_type = 'error' OR value > 90.0 OR event_type = 'purchase'
"""


@query(
    "q_branch_first_match",
    oracle=_BRANCH_ORACLE.format(b0="0", b1="1", b2="2"),
)
def q_branch_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`branch` (api.clj:62-68): ordered first-match routing; records
    matching no predicate are dropped. The predicates deliberately
    overlap (an 'error' with value>90 must land in branch 0 only) —
    the masked-filter construction guarantees disjointness while
    reading the cached parent once."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    branches = X.branch(
        ev,
        F.col("event_type") == "error",
        F.col("value") > 90.0,
        F.col("event_type") == "purchase",
    )
    tagged = [b.withColumn("branch", F.lit(i)) for i, b in enumerate(branches)]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


@query(
    "q_branch_map",
    oracle=_BRANCH_ORACLE.format(b0="'errors'", b1="'whales'", b2="'purchases'"),
)
def q_branch_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`branch-map` (api.clj:70-88): named first-match routing."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    named = X.branch_map(
        ev,
        {
            "errors": F.col("event_type") == "error",
            "whales": F.col("value") > 90.0,
            "purchases": F.col("event_type") == "purchase",
        },
    )
    tagged = [b.withColumn("branch", F.lit(name)) for name, b in named.items()]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


@query(
    "q_union_merge",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    """,
)
def q_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream `merge` parity (README.md:68-70): bag-semantics union."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    return X.merge(views)(clicks)


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics, like SQL INTERSECT)."""
    cust, supp = (
        load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")),
        load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")),
    )
    return cust.intersect(supp)


@query(
    "q_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (distinct semantics, like SQL EXCEPT)."""
    nat = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == SQL EXCEPT (distinct, removes ALL right matches);
    # exceptAll().distinct() would wrongly keep left values that also
    # appear on the right whenever the left side has duplicates.
    return nat.subtract(supp)


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) difference — EXCEPT ALL: each right occurrence
    cancels ONE left occurrence, so a nationkey with 60 customers and
    4 suppliers keeps 56 rows (plain EXCEPT would drop all 60). The
    multiplicity bookkeeping is one shuffle on the value (Spark
    plans a count-diff generate, not a join per occurrence)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.exceptAll(supp)


@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) intersection — INTERSECT ALL: each value keeps
    min(left count, right count) occurrences."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersectAll(supp)


@query(
    "q_flatmap_outer",
    oracle="""
    SELECT doc_id, token FROM (
      SELECT doc_id,
             unnest(CASE WHEN n_chars < 600 THEN string_split(text, ' ') END)
               AS token
      FROM documents)
    UNION ALL
    SELECT doc_id, CAST(NULL AS VARCHAR) AS token
    FROM documents WHERE NOT n_chars < 600
    """,
)
def q_flatmap_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`explode_outer` — the LEFT-JOIN flavor of flatMap: a row whose
    array is NULL (here: long docs excluded from tokenization) still
    emits ONE row with a null element instead of vanishing, preserving
    lineage through the expansion. DuckDB's unnest drops null arrays
    (inner-explode semantics), so the oracle re-adds the null-array
    rows with a UNION ALL — making the two explode flavors' difference
    itself the thing the oracle checks."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.when(F.col("n_chars") < 600, F.split(F.col("text"), " "))
    return docs.select("doc_id", F.explode_outer(toks).alias("token"))


@query(
    "q_repartition",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def q_repartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`through` parity (api.clj:55): an explicit repartition point —
    hash-partition by the grouping key so downstream keyed operators
    are co-located. Content is unchanged (the oracle checks that)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    return ev.repartition(32, "user_id")
