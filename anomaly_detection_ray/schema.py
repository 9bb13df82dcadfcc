"""Canonical Arrow schemas for the engine.

The clips table shape comes from ``BASELINE.json.input_hint``; the verdict
(logging-table analogue) schema mirrors the reference's fixed nested logging
schema (reference: utils/logging_table_utils.py:12-44) with our
``(dataset, partition_id)`` standing in for ``(catalog, schema, table_name)``.
Debug-map values are **strings by contract** (reference stringifies every
debug value, freshness_checker.py:461-462, and its dashboard TRY_CASTs them
back) — keep that contract.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input tables
# ---------------------------------------------------------------------------

#: Primary input: audio clip + transcript pairs (BASELINE.json input_hint).
CLIPS_SCHEMA = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("sr_hz", pa.int32()),
        pa.field("dur_ms", pa.int32()),
        pa.field("codec", pa.string()),
        pa.field("transcript", pa.string()),
    ]
)

#: Side table for referential-integrity checks (FIXTURES.md F2).
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("transcript", pa.string()),
    ]
)

#: Per-partition ingest history (reference analogue: DESCRIBE HISTORY
#: projection, utils/table_history_utils.py:65-102).  ``operationMetrics``
#: is a map<string,string> exactly like the reference's.
INGEST_HISTORY_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("timestamp", pa.timestamp("us")),
        pa.field("operation", pa.string()),
        pa.field("operationMetrics", pa.map_(pa.string(), pa.string())),
    ]
)

# ---------------------------------------------------------------------------
# Output tables
# ---------------------------------------------------------------------------

#: Downstream-impact struct (reference: blast_radius_info.py:8-16).
DOWNSTREAM_IMPACT_TYPE = pa.struct(
    [
        pa.field("impact_level", pa.int32()),
        pa.field("num_downstream_tables", pa.int32()),
        pa.field("num_queries_on_affected_tables", pa.int32()),
    ]
)

#: Verdict rows — the logging-table analogue
#: (reference: utils/logging_table_utils.py:12-44).
VERDICT_SCHEMA = pa.schema(
    [
        pa.field("evaluated_at", pa.timestamp("us")),
        pa.field("dataset", pa.string()),          # reference: catalog.schema
        pa.field("partition_id", pa.string()),     # reference: table_name
        pa.field("quality_check_type", pa.string()),
        pa.field("status", pa.string()),
        pa.field("downstream_impact", DOWNSTREAM_IMPACT_TYPE),
        pa.field(
            "additional_debug_info",
            pa.map_(pa.string(), pa.map_(pa.string(), pa.string())),
        ),
        pa.field("error_message", pa.string()),
        pa.field("lineage_id", pa.string()),       # reference: table_lineage_link
    ]
)

#: Materialized violating rows (FIXTURES.md F5).
VIOLATION_SCHEMA = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("partition_id", pa.string()),
        pa.field("check", pa.string()),
        pa.field("detail", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    """An empty Arrow table with *schema* (for zero-violation outputs)."""
    return schema.empty_table()
