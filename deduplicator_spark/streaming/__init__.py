"""Streaming operators.

DEFAULT stateful entry points — the digest-SHARDED state layouts
(VERDICT r4 item #3): semantically row-for-row equivalent to the
fine-grained per-key variants (pinned by tests/test_streaming*.py), but
one applyInPandasWithState group holds MANY keys, so per-group invocation
overhead amortizes: measured 5.3x ingest on dup-stats and 2.4x on
in-stream near-dup at equal output, with 2-vs-8-core scaling efficiency
0.988 (BENCH/STREAM_E2E_SHARDED.md, BENCH/STREAM_STATS.md).

  dup_stats      = stateful.streaming_dup_stats_sharded
  neardup_dedup  = stateful.streaming_neardup_dedup_sharded

The fine-grained ``streaming_dup_stats`` / ``streaming_neardup_dedup``
remain exported from ``stateful`` as the SEMANTIC REFERENCE — use them to
read the per-key state logic, ship the sharded ones.
"""

from .stateful import (  # noqa: F401
    streaming_dup_stats,
    streaming_dup_stats_sharded,
    streaming_neardup_dedup,
    streaming_neardup_dedup_sharded,
)

# the documented defaults (see module docstring)
dup_stats = streaming_dup_stats_sharded
neardup_dedup = streaming_neardup_dedup_sharded
