"""The reference's clickstream event schema, declared explicitly.

The reference never declares a schema — `json.loads` + optimistic key access
(/root/reference/consumer.py:123), with two implicit views of one event:
the nested wire form (record.json:3) and a flattened `_`-joined projection
(event.py:10-26). This module makes both explicit:

  * EVENT_SCHEMA     — the nested wire form as a StructType (every field
                       nullable — the payload is null-riddled, event.py:1-9)
  * ENVELOPE_FIELDS  — the per-record Kinesis envelope (record.json:1-4;
                       sequence numbers are 56-digit → kept as strings,
                       matching the reference's own handling, consumer.py:301)
  * flatten()        — generic recursive struct flatten producing exactly
                       the event.py naming (visit.device.user.user_id →
                       visit_device_user_user_id)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dtype: T.DataType = T.StringType()) -> T.StructField:
    return T.StructField(name, dtype, nullable=True)


SEARCH_SCHEMA = _s(
    _f("search_term"),
    _f("search_results"),
    _f("search_category"),
    _f("page_title"),
    _f("multisearch_keywords", T.ArrayType(T.StringType())),
    _f("multisearch_count"),
    _f("search_term_original"),
    _f("itemlist_beginindex", T.IntegerType()),
    _f("itemlist_pagesize", T.IntegerType()),
    _f("search_filter"),
)

EVENT_SCHEMA = _s(
    _f("event_name"),
    _f("event_type"),
    _f("event_id"),
    _f("record_id"),
    _f("page_event"),
    _f("event_time", T.LongType()),  # epoch millis (event.py:6)
    _f("server_time"),
    _f("event_date_time"),  # 'yyyy-MM-dd HH:mm:ss.SSS' (consumer.py:222-225)
    _f("event_time_processed"),
    _f(
        "visit",
        _s(
            _f("tealium_session_id"),
            _f("login_status"),
            _f(
                "device",
                _s(
                    _f("useragent"),
                    _f("rendering_reference"),
                    _f("visitor_id"),
                    _f("user", _s(_f("user_id"), _f("websphere_id"))),
                ),
            ),
        ),
    ),
    _f(
        "pageview",
        _s(
            _f("title"),
            _f("page_name_identifier"),
            _f("referrer"),
            _f("referrer_query"),
            _f("page_url"),
            _f("page_name"),
            _f("query_string"),
            _f("query_string_krypto"),
            _f("site_version"),
            _f("site_platform"),
            _f("query_string_array", T.ArrayType(T.ArrayType(T.StringType()))),  # record.json:15
            _f("search", SEARCH_SCHEMA),  # present only for search events (record.json:19)
        ),
    ),
    _f("message_event_types", T.ArrayType(T.StringType())),  # event.py:32
    _f(
        "data_quality",  # event.py:33-37
        T.ArrayType(
            _s(
                _f("record_id"),
                _f("event_id"),
                _f("issue_details"),
                _f("field_name"),
                _f("field_value"),
            )
        ),
    ),
)

ENVELOPE_FIELDS = _s(
    _f("sequence_number"),  # 56 digits — string, never int64 (record.json:1)
    _f("partition_key"),
    _f("approximate_arrival_timestamp", T.TimestampType()),
    _f("shard_id"),  # added by the consumer (consumer.py:125)
)


def flatten(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten all struct columns to `sep`-joined leaf columns —
    the exact producer-side transformation implied by event.py vs
    record.json (e.g. visit.device.user.user_id → visit_device_user_user_id).
    Arrays are kept as-is (leaf values)."""

    def leaves(schema: T.StructType, prefix: list[str]) -> list[Column]:
        cols: list[Column] = []
        for field in schema.fields:
            path = prefix + [field.name]
            if isinstance(field.dataType, T.StructType):
                cols.extend(leaves(field.dataType, path))
            else:
                cols.append(F.col(".".join(path)).alias(sep.join(path)))
        return cols

    return df.select(*leaves(df.schema, []))
