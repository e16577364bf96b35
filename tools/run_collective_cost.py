"""Measure the per-step communication volume of the sharded SLAM step.

Real multi-chip hardware is not available in this environment, so instead
of fabricating speedup numbers on a shared-host virtual mesh (whose
"efficiency" is meaningless — see SCALING_virtual8.jsonl), this tool
extracts the thing that actually determines scaling: the collectives
GSPMD inserted into the compiled step and the bytes each one moves.  It
compiles the SAME sharded odometry step the multi-chip path uses
(parallel/sharded.py) on an 8-virtual-device CPU mesh for both axis
layouts:

  * ("data", "map")     — single-host chip mesh (ICI)
  * ("hosts", "devices") — process-spanning mesh (DCN x ICI;
                            parallel/multihost.py)

then walks the optimized HLO for all-reduce / all-gather /
reduce-scatter / collective-permute / all-to-all ops and sums their
output bytes.  Ring-algorithm wire traffic is ~2x the logical payload
for all-reduce; the artifact records logical payload bytes and leaves
the algorithm factor to the reader (noted in the JSON).

Writes COLLECTIVES_r05.json.  Run on CPU (no TPU needed):
    python tools/run_collective_cost.py
"""

from __future__ import annotations

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "u16": 2,
                "s16": 2}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def _collectives_in(hlo: str) -> tuple[dict, list]:
    out: dict = {}
    items: list = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w-]+)\(", line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op not in _COLLECTIVES:
            continue
        if shape.startswith("("):  # tuple shape: sum elements
            nbytes = sum(
                _shape_bytes(s) for s in re.findall(r"\w+\[[\d,]*\]", shape)
            )
        else:
            nbytes = _shape_bytes(shape)
        e = out.setdefault(op, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += nbytes
        src = re.search(r'op_name="([^"]*)"', line)
        items.append(
            {"op": op, "bytes": nbytes,
             "source": src.group(1) if src else "?"}
        )
    items.sort(key=lambda d: -d["bytes"])
    return out, items[:3]


def main() -> None:
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bshot_slam_tpu.config import default_config
    from bshot_slam_tpu.odometry import pipeline
    from bshot_slam_tpu.parallel import sharded

    cfg = default_config()
    bucket = 16384
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    results = {}
    for axes, data_axis, map_axis in (
        (("data", "map"), "data", "map"),
        (("hosts", "devices"), "devices", "hosts"),
    ):
        mesh = Mesh(devs, axes)
        step, _ = sharded.sharded_odometry_step(
            mesh, cfg, tile=2048, data_axis=data_axis, map_axis=map_axis
        )
        sds = jax.ShapeDtypeStruct
        state = jax.eval_shape(lambda: pipeline.init_state(cfg))
        lowered = step.lower(
            state,
            sds((bucket, 3), np.float32),
            sds((bucket,), bool),
            sds((2,), np.uint32),
        )
        hlo = lowered.compile().as_text()
        colls, top = _collectives_in(hlo)
        total = sum(e["bytes"] for e in colls.values())
        results["x".join(axes)] = {
            "mesh_shape": dict(zip(axes, devs.shape)),
            "collectives": colls,
            "top_contributors": top,
            "total_logical_bytes_per_step": total,
            "total_mb_per_step": round(total / 1e6, 3),
        }

    artifact = {
        "config": {
            "cloud_bucket": bucket,
            "map_capacity": cfg.map.capacity,
            "top_k": cfg.keypoints.top_k,
        },
        "note": "logical payload bytes of GSPMD-inserted collectives in the "
                "compiled sharded odometry step (8 virtual devices); ring "
                "all-reduce wire traffic is ~2x the payload.  At DCN "
                "(~12.5 GB/s/host) even 10 MB/step is <1 ms — the host "
                "axis scales map capacity, not per-step latency.  Dominant "
                "term: approx_top_k's resharding all-to-all inside SHOT "
                "neighbor selection over the data-sharded cloud; a "
                "two-stage distributed top-k (shard-local top-M + gather) "
                "would cut it ~3x if multi-chip latency ever matters.",
        "meshes": results,
    }
    js = json.dumps(artifact, indent=1)
    print(js)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COLLECTIVES_r05.json"), "w") as f:
        f.write(js + "\n")


if __name__ == "__main__":
    main()
