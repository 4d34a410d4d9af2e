"""Distributed NDJSON ingestion (the /insert/jsonline path at scale).

Unlike ``schema.ingest_ndjson`` (a driver-side test helper), this path never
materializes rows on the driver: lines are read as a distributed text scan
and parsed/flattened per-partition via Arrow-batched ``mapInPandas``
(json_parser.go flattening semantics: nested keys dot-joined, arrays /
numbers / bools kept as their JSON string representation).

The parsed stream carries a ``fields map<string,string>`` column; a sampled
key-promotion step lifts frequent keys to top-level string columns (the
"promoted columns + spill map" model from SURVEY.md §1.2).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from victorialogs_spark.functions.natural import unix_auto_timestamp
from pyspark.sql import types as T

from victorialogs_spark.schema import flatten_json, with_stream_id

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("_time_raw", T.StringType()),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
    ]
)

DEFAULT_MSG = (
    "missing _msg field; see "
    "https://docs.victoriametrics.com/victorialogs/keyconcepts/#message-field"
)

PROMOTE_SAMPLE_ROWS = 10_000
MAX_PROMOTED_COLS = 2000  # mirrors the reference's per-block column cap


def parse_ndjson_lines(
    lines: DataFrame,
    time_field: str | list[str] = "_time",
    msg_field: str | list[str] = "_msg",
    ignore_fields: list[str] | None = None,
    extra_fields: dict[str, str] | None = None,
    default_msg_value: str = DEFAULT_MSG,
    decolorize_fields: list[str] | None = None,
) -> DataFrame:
    """text lines (column ``value``) → (_time_raw, fields map) rows.
    Executes on executors in Arrow batches; malformed lines are dropped.
    Applies the reference's ingest transforms (_time_field/_msg_field/
    ignore_fields/extra_fields/decolorize_fields,
    insertutil/common_params.go:32-100; ignore/decolorize names are
    prefix FILTERS — 'foo.*' drops every foo.-prefixed field, and extra
    fields re-add after the drop: log_rows.go via the r15 log-rows
    corpus)."""
    # '' in a field list names the canonical _msg field (log_rows.go)
    ig = [f or "_msg" for f in ignore_fields or []]
    ex = dict(extra_fields or {})
    deco = [f or "_msg" for f in decolorize_fields or []]
    tfs = [time_field] if isinstance(time_field, str) else list(time_field)
    mfs = [msg_field] if isinstance(msg_field, str) else list(msg_field)

    def _parse(batches: Iterator) -> Iterator:
        import pandas as pd

        from victorialogs_spark.functions.prefixfilter import match_filters


        for pdf in batches:
            times, fields = [], []
            for line in pdf["value"]:
                line = (line or "").strip()
                if not line:
                    continue
                try:
                    flat = flatten_json(json.loads(line))
                except (json.JSONDecodeError, AttributeError):
                    continue
                if ig:
                    flat = {
                        k: v
                        for k, v in flat.items()
                        if not match_filters(ig, k)
                    }
                if deco:
                    from victorialogs_spark.functions.text import (
                        drop_color_sequences,
                    )

                    for k in list(flat):
                        if match_filters(deco, k):
                            flat[k] = drop_color_sequences(flat[k])
                flat.update(ex)
                # first-present time candidate / first-non-empty msg
                # candidate (ExtractTimestampFromFields + RenameField)
                t = ""
                for tf in tfs:
                    if tf in flat:
                        t = flat.pop(tf)
                        break
                for mf in mfs:
                    if flat.get(mf, "") != "":
                        if mf != "_msg":
                            flat["_msg"] = flat.pop(mf)
                        break
                if not flat.get("_msg"):
                    flat["_msg"] = default_msg_value
                times.append(t)
                fields.append(flat)
            if times:  # empty frames infer float64 dtype, breaking Arrow maps
                yield pd.DataFrame(
                    {
                        "_time_raw": pd.Series(times, dtype="object"),
                        "fields": pd.Series(fields, dtype="object"),
                    }
                )

    return lines.mapInPandas(_parse, PARSED_SCHEMA)


def with_event_time(parsed: DataFrame) -> DataFrame:
    """_time_raw (RFC3339 / unix seconds / empty) → _time timestamp."""
    from victorialogs_spark.functions.casts import _try_cast

    t = F.coalesce(
        # try_*: ANSI mode makes plain to_timestamp THROW on e.g. unix-secs;
        # numeric stamps auto-detect their unit (s/ms/µs/ns, the
        # reference's TryParseUnixTimestamp boundaries — r15)
        F.try_to_timestamp(F.col("_time_raw")),
        # '0' means "no timestamp" and takes now() like ''/'-'
        # (insertutil parseTimestamp; r15 ingest-timestamp corpus)
        unix_auto_timestamp(F.nullif(F.col("_time_raw"), F.lit("0"))),
        F.current_timestamp(),
    )
    return parsed.withColumn("_time", t).drop("_time_raw")


def promote_columns(
    parsed: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Lift field keys to top-level string columns; unsampled keys stay in
    the ``_other`` spill map. ``keys=None`` infers from a bounded sample
    (one O(10k-row) job, not a second full pass)."""
    if keys is None:
        rows = (
            parsed.select("fields")
            .limit(PROMOTE_SAMPLE_ROWS)
            .select(F.explode(F.map_keys("fields")).alias("k"))
            .distinct()
            .limit(MAX_PROMOTED_COLS)
            .collect()
        )
        keys = sorted(r["k"] for r in rows)
    # promote everything except the engine-derived columns (_msg IS a
    # promoted column in the log model)
    keys = [k for k in keys if k not in ("_time", "_day", "_other")]
    cols = [F.col("_time")]
    cols += [
        F.coalesce(F.col("fields")[k], F.lit("")).alias(k) for k in keys
    ]
    spill = (
        F.map_filter(F.col("fields"), lambda k, _: ~k.isin(keys))
        if keys
        else F.col("fields")
    )
    cols.append(spill.alias("_other"))
    return parsed.select(*cols)


def _flatten_schema_cols(
    schema: T.StructType, parent: F.Column | None = None, prefix: str = ""
) -> list[tuple[str, F.Column]]:
    """Inferred JSON schema → flat (dot-joined name, string Column) list.
    Structs recurse; arrays/maps re-serialize via to_json; everything else
    is already a string under primitivesAsString."""
    out: list[tuple[str, F.Column]] = []
    for field in schema.fields:
        col = (
            parent.getField(field.name)
            if parent is not None
            else F.col(f"`{field.name}`")
        )
        name = f"{prefix}.{field.name}" if prefix else field.name
        if isinstance(field.dataType, T.StructType):
            out.extend(_flatten_schema_cols(field.dataType, col, name))
        elif isinstance(field.dataType, (T.ArrayType, T.MapType)):
            out.append((name, F.to_json(col)))
        else:
            out.append((name, col.cast("string")))
    return out


def ingest_ndjson_jvm(
    spark: SparkSession,
    path: str,
    time_field: str = "_time",
    msg_field: str = "_msg",
    stream_fields: list[str] | None = None,
    default_msg_value: str = DEFAULT_MSG,
    schema: T.StructType | None = None,
) -> DataFrame:
    """JVM-native NDJSON ingest: ``spark.read.json`` (whole-stage codegen
    Jackson parse, no Python workers) + schema-driven flattening — the
    bulk-load fast path, ~5-10× the mapInPandas path's rows/sec.

    ``schema`` (optional) skips the inference scan entirely — the shape a
    steady-state 100 TB loader runs, where the field layout is known from
    a prior batch or a sampled prefix. Fields must be string-typed to
    match ``primitivesAsString`` inference (use a prior run's
    ``df.schema``); rows carrying fields outside the schema lose them.

    Semantics match :func:`ingest_ndjson_distributed` (flatten_json
    dot-joining, missing ≡ empty, malformed lines dropped) with two
    documented divergences inherent to schema-driven parsing:
    - arrays re-serialize from the INFERRED type, so a mixed-type array
      like ``["a", 1]`` round-trips as ``["a","1"]`` (all-string);
    - number normalization is the JVM's, not CPython's (identical for
      typical values; differs in exotic exponent formatting).

    Schema inference is one extra scan of the input; at 100 TB either
    pass a representative sample's schema or accept the scan — both
    beat per-row Python by an order of magnitude.
    """
    raw = spark.read.json(
        path, schema=schema, primitivesAsString=True, mode="DROPMALFORMED"
    )
    out = _flatten_promote_jvm(raw, time_field, msg_field, default_msg_value)
    if stream_fields:
        out = with_stream_id(
            out, [f for f in stream_fields if f in out.columns]
        )
    return out


def parse_json_lines_jvm(
    lines: DataFrame,
    schema: T.StructType | str,
    time_field: str = "_time",
    msg_field: str = "_msg",
    default_msg_value: str = DEFAULT_MSG,
) -> DataFrame:
    """JVM parse of a text-lines DataFrame against a KNOWN schema via
    ``from_json`` — works identically on batch and Structured Streaming
    frames (no extra inference scan, no Python workers). Lines that don't
    parse (from_json → NULL struct) are dropped, like DROPMALFORMED."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # PERMISSIVE from_json yields an ALL-NULL struct for malformed lines —
    # indistinguishable from a VALID line none of whose fields appear
    # (e.g. '{}', which must still become a default-_msg row). A corrupt-
    # record column separates the two exactly.
    corrupt = "_vl_corrupt"
    while corrupt in schema.fieldNames():
        corrupt += "_"
    full = T.StructType(list(schema.fields) + [T.StructField(corrupt, T.StringType())])
    parsed = lines.where(F.trim(F.col("value")) != "").select(
        F.from_json(
            F.col("value"), full,
            {"columnNameOfCorruptRecord": corrupt},
        ).alias("__j")
    )
    parsed = (
        parsed.where(
            F.col("__j").isNotNull()
            & F.col("__j").getField(corrupt).isNull()
        )
        .select("__j.*")
        .drop(corrupt)
    )
    return _flatten_promote_jvm(parsed, time_field, msg_field, default_msg_value)


def _flatten_promote_jvm(
    raw: DataFrame,
    time_field: str,
    msg_field: str,
    default_msg_value: str,
) -> DataFrame:
    """Shared tail of the JVM ingest paths: flatten the struct columns,
    promote up to MAX_PROMOTED_COLS keys, spill the rest to _other."""
    flat = _flatten_schema_cols(raw.schema)
    flat.sort(key=lambda kv: kv[0])
    by_name = dict(flat)
    t_raw = by_name.get(time_field, F.lit(""))
    msg = by_name.get(msg_field, F.lit(""))
    # engine-owned names are never promoted as user columns, matching
    # the pandas path (promote_columns strips "_time"/"_day"/"_other";
    # the msg-field alias overwrites a literal "_msg"). Promoting a
    # literal "_day" was the sharpest hazard: append_day_partitioned
    # would skip deriving the partition column and place rows under
    # data-controlled day labels, which retention then compares
    # lexicographically — wrong partitions AND wrong expiry (r14
    # review finding).
    engine_owned = {time_field, msg_field, "_other", "_time", "_day", "_msg"}
    user_cols = [(k, v) for k, v in flat if k not in engine_owned]
    promoted = user_cols[:MAX_PROMOTED_COLS]
    overflow = user_cols[MAX_PROMOTED_COLS:]
    # engine-named user fields can't be promoted but must not vanish
    # either — they live in the spill map under their own names, same
    # as the mapInPandas path. Exceptions mirroring pandas: the active
    # time source is consumed as _time_raw, and a literal "_msg" under
    # a custom msg_field is overwritten by the alias (dropped).
    spill_names = {"_other", "_time", "_day"} - {time_field, msg_field}
    overflow += [(k, v) for k, v in flat if k in spill_names]
    cols = [t_raw.alias("_time_raw")]
    cols.append(
        F.when(
            F.coalesce(msg, F.lit("")) == "", F.lit(default_msg_value)
        ).otherwise(msg).alias("_msg")
    )
    cols += [F.coalesce(v, F.lit("")).alias(k) for k, v in promoted]
    # keys beyond the promote cap spill into the _other map (never drop
    # data silently); empty map otherwise, matching the pandas path shape
    if overflow:
        spill = F.map_filter(
            F.create_map(
                *[x for k, v in overflow for x in (F.lit(k), v)]
            ),
            lambda _, v: v.isNotNull(),
        )
    else:
        spill = F.expr("cast(map() as map<string,string>)")
    cols.append(spill.alias("_other"))
    return with_event_time(raw.select(*cols))


def ingest_ndjson_distributed(
    spark: SparkSession,
    path: str,
    time_field: str = "_time",
    msg_field: str = "_msg",
    stream_fields: list[str] | None = None,
    ignore_fields: list[str] | None = None,
    extra_fields: dict[str, str] | None = None,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """NDJSON file(s)/dir → log DataFrame, fully distributed."""
    lines = spark.read.text(path)
    parsed = with_event_time(
        parse_ndjson_lines(
            lines, time_field, msg_field, ignore_fields, extra_fields
        )
    )
    out = promote_columns(parsed, promote_keys)
    if stream_fields:
        out = with_stream_id(out, [f for f in stream_fields if f in out.columns])
    return out
