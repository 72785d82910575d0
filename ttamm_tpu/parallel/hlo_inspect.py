"""Compiled-HLO collective inspection.

The sharded train step relies on the partitioner (or the explicit
``shard_map`` exchange) to move embedding rows between shards. Whether
that lowering is *efficient* is invisible to numeric tests — a
correctness-equivalent compilation may all-gather a whole ``[rows, D]``
table to every device. These helpers parse the compiled HLO's collective
ops (name, element type, shape, payload bytes) so tests can assert
byte-level properties of the communication pattern, e.g. "no collective
moves anything the size of a full embedding table" or "sparse-Adam moment
updates stay shard-local".
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_COLLECTIVE_OPS = (
    "all-gather-start",
    "all-gather",
    "all-reduce-start",
    "all-reduce",
    "all-to-all",
    "reduce-scatter",
    "collective-permute-start",
    "collective-permute",
    "ragged-all-to-all",
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.+?)\s+("
    + "|".join(_COLLECTIVE_OPS)
    + r")\(",
    re.M,
)


@dataclass(frozen=True)
class CollectiveOp:
    """One collective instruction in compiled HLO."""

    op: str  # canonical name, e.g. 'all-gather' (async -start forms folded)
    result_shapes: tuple[str, ...]  # e.g. ('f32[16,16]',)
    bytes: int  # total result payload bytes
    max_component_bytes: int  # largest single tensor in a fused tuple
    group_size: int | None = None  # devices per replica group (mesh axis)

    def __str__(self) -> str:
        return f"{self.op} {'+'.join(self.result_shapes)} ({self.bytes} B)"


# replica_groups={{0,2},{1,3}} (explicit) or replica_groups=[4,2]<=[8]
# (iota form: num_groups x group_size).
_GROUPS_EXPLICIT_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[\d+,(\d+)\]")


def _parse_group_size(line: str) -> int | None:
    m = _GROUPS_EXPLICIT_RE.search(line)
    if m:
        return m.group(1).count(",") + 1
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        return int(m.group(1))
    return None


def _shape_bytes(shape: str) -> int:
    m = _SHAPE_RE.match(shape)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collect_collectives(hlo_text: str) -> list[CollectiveOp]:
    """All collective instructions with their result shapes and bytes.

    Async pairs are counted once: the ``*-start`` op carries the shapes;
    the matching ``*-done`` is not a collective instruction in HLO text.
    Tuple results (e.g. fused all-reduces) contribute every element.
    """
    ops: list[CollectiveOp] = []
    for m in _OP_RE.finditer(hlo_text):
        result, op = m.groups()
        shapes = tuple(
            f"{t}[{dims}]" for t, dims in _SHAPE_RE.findall(result)
        )
        per_shape = [_shape_bytes(s) for s in shapes]
        line_end = hlo_text.find("\n", m.end())
        line = hlo_text[m.end() : line_end if line_end != -1 else None]
        ops.append(
            CollectiveOp(
                op=op.removesuffix("-start"),
                result_shapes=shapes,
                bytes=sum(per_shape),
                max_component_bytes=max(per_shape, default=0),
                group_size=_parse_group_size(line),
            )
        )
    return ops


def collective_summary(hlo_text: str) -> dict[str, dict[str, int]]:
    """Per-op-kind ``{count, bytes}`` totals for a compiled module."""
    summary: dict[str, dict[str, int]] = {}
    for c in collect_collectives(hlo_text):
        entry = summary.setdefault(c.op, {"count": 0, "bytes": 0})
        entry["count"] += 1
        entry["bytes"] += c.bytes
    return summary


def oversized_collectives(
    hlo_text: str, limit_bytes: int
) -> list[CollectiveOp]:
    """Collectives moving a single tensor of at least ``limit_bytes``.

    Judged per tuple component, not per fused op: XLA coalesces many
    small independent reductions into one tuple-shaped all-reduce — a
    latency optimization, not a table-sized transfer.
    """
    return [
        c
        for c in collect_collectives(hlo_text)
        if c.max_component_bytes >= limit_bytes
    ]


def assert_no_table_sized_collectives(
    hlo_text: str, table_shapes: dict[str, tuple[int, ...]], *,
    element_bytes: int = 4, fraction: float = 0.5,
) -> None:
    """Raise if any collective moves >= ``fraction`` of the smallest table.

    ``table_shapes`` maps table name -> (rows, dim). A partitioner that
    falls back to gathering a whole row-sharded table produces an
    all-gather (or equivalent) of at least table-size bytes; every
    legitimate exchange in the step is batch-sized, orders of magnitude
    smaller when rows >> batch.
    """
    smallest = min(
        rows * dim * element_bytes for rows, dim in table_shapes.values()
    )
    limit = int(smallest * fraction)
    bad = oversized_collectives(hlo_text, limit)
    if bad:
        listing = "\n  ".join(str(c) for c in bad)
        raise AssertionError(
            f"Collectives moving >= {limit} bytes (>= {fraction:.0%} of the "
            f"smallest table) found in compiled HLO:\n  {listing}"
        )
