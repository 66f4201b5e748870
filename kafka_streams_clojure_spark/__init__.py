"""kafka_streams_clojure_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference (bobby/kafka-streams-clojure: Clojure transducers over
Kafka Streams — see /root/reference/src/kafka_streams_clojure/api.clj),
re-expressed Spark-first:

- the reference's *transducible context* contract (any composable
  transducer becomes a dataflow operator over [key value] records,
  api.clj:49-51) maps to a combinator layer where every operator is
  ``DataFrame -> DataFrame`` and ``compose`` fuses a pipeline that
  Catalyst whole-stage-codegens (the analog of transducer fusion);
- topic sources/sinks map to DataFrameReader/Writer + Structured
  Streaming's Kafka source;
- ``branch``/``branch-map`` (api.clj:62-88) map to first-match masked
  filters over a single cached parent;
- the ordered state-store read API (get/all/range, api.clj:102-152)
  maps to keyed DataFrames / memory-sink tables queried with SQL;
- the KStream/KTable parity roadmap (joins, windowed aggregates,
  stateful transducers — README.md:28-34) maps to DataFrame joins,
  ``window()``/``session_window()`` aggregates, and
  ``applyInPandasWithState``.

Everything here is idiomatic DataFrame/Catalyst code designed for
multi-executor scale: no driver-side collects in operator paths, no
row-at-a-time Python UDFs in hot paths, broadcast hints for dimension
joins, and explicit orderings for any order-sensitive semantics.
"""

from kafka_streams_clojure_spark.session import get_spark, load_table, load_tables
from kafka_streams_clojure_spark.xform import (
    branch,
    branch_map,
    compose,
    dedupe,
    distinct,
    drop,
    filter_,
    flat_map,
    flat_map_values,
    keep,
    map_,
    map_values,
    merge,
    partition_all,
    partition_by,
    select_key,
    take,
    transduce,
)

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "compose",
    "transduce",
    "filter_",
    "map_",
    "map_values",
    "flat_map",
    "flat_map_values",
    "keep",
    "select_key",
    "branch",
    "branch_map",
    "merge",
    "distinct",
    "dedupe",
    "take",
    "drop",
    "partition_by",
    "partition_all",
]

__version__ = "0.1.0"
