"""Rich-schema ingest (S6/S8) and the UDF surface (U1-U3).

The reference's rich profile is a 13-field trade event JSON-validated
at the source (``old/kfk.py:69-107``, generator ``old/generate.py:19-33``)
with scalar UDFs registered into the Table environment
(``old/kfk.py:13-50,117-120``). Here:

* ingest = ``from_json`` with the declared StructType — a native JVM
  expression (the reference's ``parse_json`` UDF, U1, needs no Python
  at all in Spark);
* the UDF surface is exercised where the reference actually used it —
  a registered scalar function callable from SQL (U3) and a vectorized
  pandas UDF (the engine's sanctioned Python escape hatch; Arrow
  batches, not per-row pickling).

The rich events are synthesized deterministically from the lineitem
fixture so the DuckDB oracle can re-derive identical input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kafka_flink_spark.schemas import TRADE_RICH_WIRE_SCHEMA
from kafka_flink_spark.sources.fixtures import load_table
from kafka_flink_spark.suite import register

# Deterministic 13-field rich-trade JSON from lineitem columns: the
# Spark side and the DuckDB oracle build byte-identical wire strings.
_RICH_JSON_SPARK = """
to_json(named_struct(
  'Timestamp', CAST(l_orderkey * 60000 + 1704067200000 AS BIGINT),
  'InstrumentId', concat('INST_', CAST(l_partkey % 100 AS STRING)),
  'Product', concat('Product_', CAST(l_suppkey % 50 AS STRING)),
  'Price', l_extendedprice,
  'Qty', CAST(l_quantity AS INT),
  'Direction', CASE WHEN l_linenumber % 2 = 0 THEN 'Buy' ELSE 'Sell' END,
  'DirectAskCounterparty', nullif(l_returnflag, 'N'),
  'DirectBidCounterparty', nullif(l_linestatus, 'O'),
  'IsImplied', l_discount > 0.05,
  'IsLegTrade', l_linenumber > 3,
  'IsOtc', l_tax > 0.04,
  'OTCTradeType', CASE WHEN l_tax > 0.04 THEN concat('OTC-', l_returnflag) ELSE NULL END,
  'Id', concat(CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))
))
"""

_RICH_JSON_DUCK = """
to_json(struct_pack(
  "Timestamp" := CAST(l_orderkey * 60000 + 1704067200000 AS BIGINT),
  "InstrumentId" := 'INST_' || CAST(l_partkey % 100 AS VARCHAR),
  "Product" := 'Product_' || CAST(l_suppkey % 50 AS VARCHAR),
  "Price" := l_extendedprice,
  "Qty" := CAST(l_quantity AS INT),
  "Direction" := CASE WHEN l_linenumber % 2 = 0 THEN 'Buy' ELSE 'Sell' END,
  "DirectAskCounterparty" := nullif(l_returnflag, 'N'),
  "DirectBidCounterparty" := nullif(l_linestatus, 'O'),
  "IsImplied" := l_discount > 0.05,
  "IsLegTrade" := l_linenumber > 3,
  "IsOtc" := l_tax > 0.04,
  "OTCTradeType" := CASE WHEN l_tax > 0.04 THEN 'OTC-' || l_returnflag ELSE NULL END,
  "Id" := CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
))
"""


def rich_wire_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized rich-trade JSON wire stream (one value per row)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(f"SELECT {_RICH_JSON_SPARK} AS value FROM lineitem")


@register(
    "s6_rich_schema_ingest",
    oracle=f"""
WITH wire AS (SELECT {_RICH_JSON_DUCK} AS value FROM lineitem),
parsed AS (
    SELECT CAST(json_extract_string(value, '$.Direction') AS VARCHAR) AS direction,
           CAST(json_extract(value, '$.IsOtc') AS BOOLEAN) AS is_otc,
           CAST(json_extract(value, '$.IsImplied') AS BOOLEAN) AS is_implied,
           CAST(json_extract(value, '$.Price') AS DOUBLE) AS price,
           CAST(json_extract(value, '$.Qty') AS INT) AS qty
    FROM wire
)
SELECT direction,
       is_otc,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(CASE WHEN is_implied THEN 1 ELSE 0 END) AS BIGINT) AS n_implied,
       sum(CAST(round(price * 1000) AS BIGINT) * qty) / 1000.0 AS notional
FROM parsed
GROUP BY direction, is_otc
""",
    doc="S6/S8/U1: 13-field rich trade schema ingest (reference "
    "old/kfk.py:69-107) — JSON wire → from_json(StructType) with "
    "fail-surface-as-null semantics, then the domain filter/aggregate "
    "the rich flags exist for (SURVEY.md §2.3 note): notional by "
    "direction × OTC flag.",
)
def s6_rich_schema_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    wire = rich_wire_frame(spark, sf_dir)
    parsed = wire.select(
        F.from_json("value", TRADE_RICH_WIRE_SCHEMA).alias("r")
    ).select("r.*")
    return (
        parsed.groupBy(
            F.col("Direction").alias("direction"), F.col("IsOtc").alias("is_otc")
        )
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.sum(F.when(F.col("IsImplied"), 1).otherwise(0)).cast("long").alias("n_implied"),
            # Price is a 3-dp decimal: sum exact milli-units so the result
            # is summation-order independent (see relational_queries note).
            (
                F.sum(F.round(F.col("Price") * 1000).cast("long") * F.col("Qty")) / 1000.0
            ).alias("notional"),
        )
    )


@register(
    "u3_registered_sql_udf",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
FROM lineitem
WHERE l_quantity >= 45
""",
    doc="U3: scalar UDF registered into the SQL catalog "
    "(spark.udf.register, reference t_env.register_function "
    "old/kfk.py:117-120) and invoked from SQL text. Row-at-a-time "
    "Python — deliberately confined to a tiny filtered input; the "
    "vectorized form is u2.",
)
def u3_registered_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")

    def net_price(ext: float, disc: float, tax: float) -> float:
        # no rounding: the raw IEEE product is bit-identical across
        # engines, while round() algorithms differ in the last digit
        return ext * (1.0 - disc) * (1.0 + tax)

    spark.udf.register("net_price", net_price, T.DoubleType())
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               net_price(l_extendedprice, l_discount, l_tax) AS net_price
        FROM lineitem
        WHERE l_quantity >= 45
        """
    )


@register(
    "u2_pandas_udf_vectorized",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
FROM lineitem
WHERE l_quantity >= 45
""",
    doc="U2: the same scalar as u3 through a vectorized pandas UDF "
    "(Arrow batches — the sanctioned Python path at scale, ~10-100x "
    "the row-at-a-time form; reference calculate_ohlc old/kfk.py:35-50 "
    "crossed per-row).",
)
def u2_pandas_udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf(T.DoubleType())
    def net_price_vec(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ext * (1.0 - disc) * (1.0 + tax)

    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey",
        "l_linenumber",
        net_price_vec("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


@register(
    "u6_python_udtf",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       CAST(g // 32 AS INT) AS chunk_no,
       array_to_string(list_slice(w, g + 1, g + 32), ' ') AS piece,
       CAST(least(32, len(w) - g) AS BIGINT) AS n_words
FROM (SELECT doc_id, w, unnest(generate_series(0, greatest(len(w) - 1, 0), 32)) AS g
      FROM t)
""",
    doc="Python UDTF surface (U6 — the reference's DoFn/1-to-N shape, "
    "old/beam.py:8-23): a @udtf class invoked via LATERAL in SQL, one "
    "eval() yielding N chunk rows per document. Arrow-batched like "
    "every Python boundary here; the declarative t5_doc_chunks form "
    "(explode+slice) remains the preferred plan — this registers the "
    "API surface itself.",
)
def u6_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, piece string, n_words long")
    class Chunker:
        def eval(self, text: str, size: int):
            words = text.split(" ")
            for i in range(0, len(words), size):
                piece = words[i : i + size]
                yield i // size, " ".join(piece), len(piece)

    spark.udtf.register("doc_chunker", Chunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.piece, c.n_words "
        "FROM docs_udtf d, LATERAL doc_chunker(d.text, 32) c"
    )


@register(
    "u7_pandas_grouped_agg_udaf",
    oracle="""
SELECT l_returnflag,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) * 1.0
           / (sum(CAST(l_quantity AS BIGINT)) * 100.0) AS w_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Grouped-aggregate pandas UDF (the Python UDAF surface, "
    "PandasUDFType.GROUPED_AGG): quantity-weighted average price per "
    "returnflag. The UDAF accumulates in exact int64 cents inside "
    "pandas (accumulation ORDER varies with partition read order, so "
    "float sums there would not be reproducible; integer sums are), "
    "then performs the identical float division the oracle does. "
    "Arrow-batched per group; one shuffle on the group key. Spark disallows mixing a GROUPED_AGG UDF with JVM aggregates in one agg, so the query is the UDAF alone.",
)
def u7_pandas_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf(T.DoubleType())
    def w_avg_cents(cents: pd.Series, qty: pd.Series) -> float:
        num = int((cents * qty).sum())
        den = int(qty.sum())
        return num * 1.0 / (den * 100.0)

    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        w_avg_cents(cents.alias("c"), qty.alias("q")).alias("w_avg_price")
    )


_TRADE_GEN_ORACLE = """
SELECT seq,
       1700000000000 + seq AS ts_ms,
       'Instrument_' || CAST(CAST(('0x' || substr(h, 9, 4)) AS BIGINT) % 100 AS VARCHAR)
           AS instrument_id,
       'Product_' || CAST(CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 2000 AS VARCHAR)
           AS product,
       (CAST(('0x' || substr(h, 13, 8)) AS BIGINT) % 999000) / 1000.0 + 1.0 AS price,
       CAST(('0x' || substr(h, 21, 4)) AS BIGINT) % 100 + 1 AS qty
FROM (SELECT seq, md5('trade:' || CAST(seq AS VARCHAR)) AS h
      FROM range(10000) t(seq))
"""


@register(
    "s10_python_datasource_gen",
    oracle=_TRADE_GEN_ORACLE,
    doc="Custom Python Data Source (Spark 4 DataSource API, "
    "sources/trade_gen.py): the reference's single-process kafka-python "
    "load generator (old/gen.py:13-36 — 2000 products, price [1,1000], "
    "qty [1,100], epoch-ms ts) as a first-class partition-parallel "
    "SOURCE: spark.read.format('trade_gen') plans contiguous seq "
    "ranges onto executors, no driver loop. Every field is an md5 "
    "slice of the global seq, so any parallelism yields the identical "
    "relation and the oracle regenerates it bit-for-bit from range().",
)
def s10_python_datasource_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.sources.trade_gen import register_trade_gen

    register_trade_gen(spark)
    return (
        spark.read.format("trade_gen")
        .option("rows", "10000")
        .option("partitions", "8")
        .load()
    )


@register(
    "u8_table_arg_udtf",
    oracle="""
WITH t AS (
    SELECT event_type AS product, ts, event_id, value AS price FROM events
),
ranked AS (
    SELECT product, price,
           row_number() OVER (PARTITION BY product ORDER BY ts, event_id) AS rn,
           row_number() OVER (PARTITION BY product ORDER BY ts DESC, event_id DESC) AS rrn
    FROM t
)
SELECT product,
       max(CASE WHEN rn = 1 THEN price END) AS open,
       max(price) AS high,
       min(price) AS low,
       max(CASE WHEN rrn = 1 THEN price END) AS close,
       CAST(count(*) AS BIGINT) AS n_trades
FROM ranked
GROUP BY product
""",
    doc="Python UDTF with a TABLE argument (Spark 4 polymorphic "
    "table function): SELECT * FROM ohlc_udtf(TABLE(t) PARTITION BY "
    "product ORDER BY ts, event_id) — the engine partitions and "
    "orders the input, each partition streams through one UDTF "
    "instance's eval(), terminate() emits the per-key fold. This is "
    "the reference's KeyedProcessFunction shape (7_ohlc.py:35-98) as "
    "a SQL-invocable operator; arrival order is pinned by the ORDER "
    "BY so the fold is deterministic, and the oracle is the "
    "equivalent declarative aggregate.",
)
def u8_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="product string, open double, high double, low double, "
          "close double, n_trades long")
    class OhlcUdtf:
        def __init__(self):
            self.product = None
            self.open = None
            self.high = None
            self.low = None
            self.close = None
            self.n = 0

        def eval(self, row):
            p = row["price"]
            self.product = row["product"]
            if self.open is None:
                self.open = p
                self.high = p
                self.low = p
            else:
                self.high = max(self.high, p)
                self.low = min(self.low, p)
            self.close = p
            self.n += 1

        def terminate(self):
            if self.n:
                yield (self.product, self.open, self.high, self.low,
                       self.close, self.n)

    spark.udtf.register("ohlc_udtf", OhlcUdtf)
    load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("product"), "ts", "event_id",
        F.col("value").alias("price"),
    ).createOrReplaceTempView("u8_trades")
    return spark.sql(
        """
        SELECT * FROM ohlc_udtf(
            TABLE(u8_trades) PARTITION BY product ORDER BY (ts, event_id)
        )
        """
    )


@register(
    "u9_arrow_python_udf",
    oracle="""
SELECT s_suppkey,
       upper(s_name) || '#' || CAST(s_nationkey AS VARCHAR) AS tag
FROM supplier
""",
    doc="Arrow-optimized scalar Python UDF (Spark 4 useArrow=True): "
    "per-row Python semantics but Arrow-batched transfer — the "
    "drop-in upgrade path for legacy row-at-a-time UDFs that can't be "
    "rewritten as pandas series ops (u2) or native expressions (u3). "
    "Completes the Python-boundary matrix: native > pandas_udf > "
    "arrow-python-udf > pickled-row udf (the last deliberately absent "
    "from every hot path).",
)
def u9_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")

    @F.udf(returnType=T.StringType(), useArrow=True)
    def tag(name: str, nationkey: int) -> str:
        return f"{name.upper()}#{nationkey}"

    return s.select("s_suppkey", tag("s_name", "s_nationkey").alias("tag"))


_KAFKA_LOG_ORACLE = """
SELECT seq AS offset,
       seq,
       1700000000000 + seq AS ts_ms,
       'Instrument_' || CAST(CAST(('0x' || substr(h, 9, 4)) AS BIGINT) % 100 AS VARCHAR)
           AS instrument_id,
       'Product_' || CAST(CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 2000 AS VARCHAR)
           AS product,
       (CAST(('0x' || substr(h, 13, 8)) AS BIGINT) % 999000) / 1000.0 + 1.0 AS price,
       CAST(('0x' || substr(h, 21, 4)) AS BIGINT) % 100 + 1 AS qty
FROM (SELECT seq, md5('trade:' || CAST(seq AS VARCHAR)) AS h
      FROM range(10000) t(seq))
WHERE seq >= 2500
"""


@register(
    "s11_kafka_log_offset_replay",
    oracle=_KAFKA_LOG_ORACLE,
    doc="S2/S3 start-position semantics made executable without a "
    "broker (sources/kafka_log.py): a 10k-record JSON trade log in "
    "sealed base-offset-named segments (what a single-partition topic "
    "fed by the reference's old/gen.py producer holds; position "
    "control old/kfk.py:64) is batch-read FROM OFFSET 2500, one "
    "input split per overlapping segment, and the wire envelope "
    "decoded via from_json — bit-exact against the md5 generator "
    "recipe regenerated in SQL. The streaming form (earliest/latest "
    "first-start, checkpoint-beats-start-position, offset-range "
    "replay) is pinned in tests/test_kafka_log.py.",
)
def s11_kafka_log_offset_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.sources.fixtures import scratch_dir
    from kafka_flink_spark.sources.kafka_log import register_kafka_log, write_trade_log

    register_kafka_log(spark)
    log = scratch_dir("s11_kafka_log_") + "/topic"
    write_trade_log(log, 10_000, segment_rows=2500)
    wire = (
        spark.read.format("kafka_log")
        .option("path", log)
        .option("startingOffset", "2500")
        .load()
    )
    return wire.select(
        "offset",
        F.from_json(
            "value",
            "seq long, ts_ms long, instrument_id string, "
            "product string, price double, qty long",
        ).alias("r"),
    ).select("offset", "r.*")


@register(
    "s12_streaming_generator_replay",
    oracle="""
SELECT seq,
       1700000000000 + seq AS ts_ms,
       'Instrument_' || CAST(CAST(('0x' || substr(h, 9, 4)) AS BIGINT) % 100 AS VARCHAR)
           AS instrument_id,
       'Product_' || CAST(CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 2000 AS VARCHAR)
           AS product,
       (CAST(('0x' || substr(h, 13, 8)) AS BIGINT) % 999000) / 1000.0 + 1.0 AS price,
       CAST(('0x' || substr(h, 21, 4)) AS BIGINT) % 100 + 1 AS qty
FROM (SELECT seq, md5('trade:' || CAST(seq AS VARCHAR)) AS h
      FROM range(5000) t(seq))
""",
    doc="S7: the in-pipeline mock generator executed on the STREAMING "
    "path — readStream.format('trade_gen') (the Python DataSource's "
    "stream reader, offset = global seq) replayed to completion via "
    "availableNow into a memory sink. Because every field is an md5 "
    "slice of seq and the stream's first batch covers seqs "
    "[0, rowsPerBatch), the streamed relation is bit-identical to "
    "the oracle's regeneration — the generator is its own "
    "write-ahead log (reference old/gen.py mock producer; S5's "
    "batch twin is s10).",
)
def s12_streaming_generator_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.sources.trade_gen import register_trade_gen
    from kafka_flink_spark.streaming.candles_stream import run_available_now

    register_trade_gen(spark)
    stream = (
        spark.readStream.format("trade_gen").option("rowsPerBatch", "5000").load()
    )
    return run_available_now(stream, "append")


@register(
    "u10_cogrouped_asof",
    oracle="""
WITH p AS (
    SELECT user_id, ts, max(value) AS pval
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT e.event_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       e.event_type,
       round(p.pval, 2) AS last_purchase_value,
       CAST(CASE WHEN p.pval IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS has_prior
FROM events e
ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    doc="Two-sided keyed as-of stamping (the Beam CoGroupByKey / "
    "Flink connect analog): per user, every event is stamped with "
    "the user's most recent purchase value at-or-before its "
    "timestamp; purchases at one (user, ts) are pre-aggregated so "
    "the match is deterministic. The oracle is DuckDB's native ASOF "
    "LEFT JOIN. Executes on the NATIVE union + ordered-window as-of "
    "composition (operators/asof.asof_join - the j6/j7/j9 operator): "
    "one linear shuffle of |events|+|purchases| rows on the user "
    "key, zero Python nodes. Through round 11 this ran as "
    "groupBy().cogroup().applyInPandas(pd.merge_asof) - the "
    "API-parity surface for Spark's cogrouped-pandas map - but the "
    "cogroup path pays a Python call and two Arrow frame builds PER "
    "USER (1500 groups at sf0.1, seconds of per-group overhead for "
    "~0.1s of real work), so r12 moved execution onto the codegen "
    "operator per guide 4.1 (the r11 verdict's sanctioned "
    "re-expression); values are identical under the same oracle, "
    "and the backward-inclusive as-of semantics stay pinned by "
    "tests/test_llm_ops.py::test_cogrouped_asof_semantics.",
)
def u10_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_flink_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"), "value")
        .groupBy("user_id", "pts")
        .agg(F.max("value").alias("pval"))
    )
    # Backward inclusive match - exactly pd.merge_asof(direction=
    # "backward", allow_exact_matches=True), which asof_join's
    # non-strict mode implements (a same-instant purchase sorts
    # before the event row in the window order, so the event sees it).
    m = asof_join(
        ev.select("event_id", "ts", "user_id", "event_type"),
        purchases,
        "user_id",
        left_ts="ts",
        right_ts="pts",
    )
    return m.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_type",
        F.round(F.col("pval"), 2).alias("last_purchase_value"),
        F.when(F.col("pval").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("has_prior"),
    )
