"""Audit compiled HLO for sharding-locality regressions.

The GSPMD partitioner silently falls back to replication (all-gather the
operand to every chip) whenever it cannot prove an op is batch-local — the
exact failure mode `ops.bilinear.resolve_batch_local` exists to prevent
(feature maps re-gathered inside the decoder loop, fwd and bwd). These
helpers read an `.compile().as_text()` dump and flag any all-gather moving
more than `limit` bytes, so the train step, the sharded eval forward, and
the driver dryrun all pin the property with ONE implementation
(`tests/test_sharding_locality.py`, `__graft_entry__.dryrun_multichip`).

The reference never needs this: DDP replicates the model and keeps batches
process-local by construction (`/root/reference/train.py:93,140`).
"""

from __future__ import annotations

import re

_NBYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
# result type of an all-gather: either one array ("= bf16[2,64]{1,0}
# all-gather(") or the tuple form XLA's all-gather combiner / async
# all-gather-start emit ("= (bf16[..]{..}, bf16[..]{..}) all-gather(").
# The instruction NAME can itself be "%all-gather.123", so anchor on the
# "= <type> all-gather...(" span, not on the word alone.
_AG = re.compile(r"= (\([^)]*\)|\S+) all-gather(?:-start)?\(")


def shape_bytes(typestr: str) -> int:
    """Total bytes of every array shape in an HLO type string (sums tuple
    elements; unknown dtypes count 4 bytes/elem)."""
    total = 0
    for m in _SHAPE.finditer(typestr):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * _NBYTES.get(m.group(1), 4)
    return total


def large_allgathers(hlo: str, limit: int = 64 * 1024) -> list[tuple[int, str]]:
    """(bytes, line) for every all-gather whose RESULT moves >= `limit`.

    Conservative on async pairs: an `all-gather-start` result tuple carries
    both the source and destination buffers, so those lines count ~2x their
    payload — a flagged straggler should be sanity-checked against the
    matching `all-gather-done` before treating the size as exact.
    """
    out = []
    for line in hlo.splitlines():
        m = _AG.search(line)
        if not m:
            continue
        size = shape_bytes(m.group(1))
        if size >= limit:
            out.append((size, line.strip()))
    return out


def assert_no_large_allgathers(hlo: str, limit: int = 64 * 1024,
                               what: str = "computation") -> None:
    """Raise if the compiled `hlo` contains feature-map-sized all-gathers
    (anything >= `limit` bytes; gradient all-reduces and sub-limit loss-path
    stragglers are expected and allowed)."""
    big = large_allgathers(hlo, limit)
    assert not big, (
        f"feature-map-sized all-gathers in the {what}: "
        + "; ".join(f"{s} B: {l[:160]}" for s, l in big)
        + " — see ops/bilinear.resolve_batch_local"
    )
