"""Profiler helper: xplane parsing + categorization (CPU traces have no
device plane, so parsing is exercised on a synthetic xplane proto)."""

import numpy as np

from racformer_tpu.tools.profile_tpu import categorize, parse_xplane


def _write_xplane(tmp_path, ops):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    line = plane.lines.add()
    line.name = "XLA Ops"
    for i, (name, dur_ps) in enumerate(ops, start=1):
        meta = plane.event_metadata[i]
        meta.id = i
        meta.name = name
        ev = line.events.add()
        ev.metadata_id = i
        ev.duration_ps = dur_ps
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(xs.SerializeToString())
    return tmp_path


def test_parse_and_categorize(tmp_path):
    outdir = _write_xplane(tmp_path, [
        ("%fusion.1 = bf16[8] fusion(...)", int(3e9)),
        ("%gather.2 = f32[4] gather(...)", int(2e9)),
        ("%custom-call.3 = tpu_custom_call", int(1e9)),
        ("%while.17 = (s32[]) while(...)", int(5e9)),
    ])
    byname = parse_xplane(str(outdir))
    assert len(byname) == 4
    assert np.isclose(byname["%gather.2 = f32[4] gather(...)"], 2e-3)
    cat = categorize(byname)
    assert np.isclose(cat["gather"], 2e-3)
    assert np.isclose(cat["while(control)"], 5e-3)
    assert np.isclose(cat["fusion(elementwise)"], 3e-3)
    assert np.isclose(cat["custom-call(pallas)"], 1e-3)
