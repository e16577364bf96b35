"""Live headless view of a RUNNING SLAM session.

The reference's main driver is fundamentally a visual tool: an OpenCV Viz
window redraws the world cloud, map keypoints, correspondences, and the
gold-trajectory overlay every frame (reference: test/odometry_test.cpp:
195-345).  On a headless TPU host this module provides the same live view
without a display: every N frames it atomically rewrites

    DIR/live.svg    top-down map keypoints + trajectory (+ gold overlay)
                    with a stats panel
    DIR/live.json   machine-readable per-frame stats
    DIR/live.html   (written once) auto-refreshing wrapper — open it in any
                    browser / VS Code preview to watch the run

Atomic replace (tmp + rename) means a watcher never reads a half-written
frame.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import numpy as np

_HTML = """<!doctype html>
<html><head><meta charset="utf-8">
<meta http-equiv="refresh" content="1">
<title>bshot_slam_tpu live</title></head>
<body style="margin:0;background:#111">
<img src="live.svg" style="width:100%;max-width:1100px"/>
</body></html>
"""


def _atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class LiveView:
    """Periodic artifact refresh for a running SlamEngine."""

    def __init__(self, out_dir: str, every: int = 5,
                 max_map_points: int = 6000, size: int = 1000):
        self.dir = out_dir
        self.every = max(1, every)
        self.max_map_points = max_map_points
        self.size = size
        os.makedirs(out_dir, exist_ok=True)
        _atomic_write(os.path.join(out_dir, "live.html"), _HTML)

    def maybe_update(self, engine, gold: Optional[np.ndarray] = None) -> bool:
        n = len(engine.records)
        if n == 0 or n % self.every:
            return False
        self.update(engine, gold)
        return True

    def update(self, engine, gold: Optional[np.ndarray] = None) -> None:
        traj = engine.trajectory
        mp = np.asarray(engine.state.map.positions)
        mv = np.asarray(engine.state.map.valid)
        pts = mp[mv]
        if len(pts) > self.max_map_points:
            idx = np.linspace(0, len(pts) - 1, self.max_map_points).astype(int)
            pts = pts[idx]
        rec = engine.records[-1]
        # Inlier correspondence segments of the newest frame (reference
        # corrviewer: odometry_test.cpp:281-345) — available when the
        # engine runs with keep_corr=True.
        corr_segs = []
        lc = getattr(engine, "last_corr", None)
        if lc is not None:
            cap = lc["map_cap"]
            for i in np.flatnonzero(lc["inlier"]):
                j = int(lc["index"][i])
                if 0 <= j < cap:
                    tgt = mp[j]
                elif lc["prev_src_world"] is not None and j >= cap:
                    k = j - cap
                    if k >= len(lc["prev_src_world"]):
                        continue
                    tgt = lc["prev_src_world"][k]
                else:
                    continue
                corr_segs.append((lc["src_world"][i], tgt))
        stats = {
            "frame": len(engine.records),
            "map_size": rec.map_size,
            "n_inliers": rec.n_inliers,
            "n_mutual": rec.n_mutual,
            "gated": rec.gated,
            "gated_total": int(sum(r.gated for r in engine.records)),
            "n_dropped": rec.n_dropped,
            "pos_mm": [round(float(v), 1) for v in rec.pose[:3, 3]],
            "keyframes": int(engine.keyframes.count),
            "loop_edges": len(getattr(engine, "loop_edges", [])),
        }
        stats["corr_drawn"] = len(corr_segs)
        _atomic_write(
            os.path.join(self.dir, "live.svg"),
            self._render_svg(traj, pts, gold, stats, corr_segs),
        )
        _atomic_write(
            os.path.join(self.dir, "live.json"), json.dumps(stats)
        )

    def _render_svg(self, traj, map_pts, gold, stats, corr_segs=()) -> str:
        S = self.size
        panel = 260  # stats panel width
        # Common top-down frame over everything drawn.
        chunks = [t[:, :2] for t in (traj, map_pts) if len(t)]
        if gold is not None and len(gold):
            chunks.append(np.asarray(gold)[:, :2])
        if not chunks:
            return "<svg xmlns='http://www.w3.org/2000/svg'/>"
        allp = np.concatenate(chunks)
        lo, hi = allp.min(0), allp.max(0)
        span = float(np.maximum(hi - lo, 1e-9).max())
        pad = 0.06 * span

        def px(p):
            q = (np.asarray(p)[:, :2] - lo + pad) / (span + 2 * pad) * S
            return q[:, 0], S - q[:, 1]

        parts = [
            f"<svg xmlns='http://www.w3.org/2000/svg' width='{S + panel}' "
            f"height='{S}' viewBox='0 0 {S + panel} {S}'>",
            f"<rect width='{S + panel}' height='{S}' fill='#181818'/>",
            f"<rect width='{S}' height='{S}' fill='#101018'/>",
        ]
        if len(map_pts):
            x, y = px(map_pts)
            dots = "".join(
                f"<circle cx='{a:.1f}' cy='{b:.1f}' r='1.2'/>"
                for a, b in zip(x, y)
            )
            parts.append(f"<g fill='#4e79a7' opacity='0.6'>{dots}</g>")
        if gold is not None and len(gold):
            x, y = px(np.asarray(gold))
            parts.append(
                "<polyline fill='none' stroke='#59a14f' stroke-width='2' "
                "stroke-dasharray='6 4' points='"
                + " ".join(f"{a:.1f},{b:.1f}" for a, b in zip(x, y)) + "'/>"
            )
        if corr_segs:
            a = np.asarray([s[0] for s in corr_segs])
            bpts = np.asarray([s[1] for s in corr_segs])
            ax, ay = px(a)
            bx, by = px(bpts)
            lines = "".join(
                f"<line x1='{x1:.1f}' y1='{y1:.1f}' x2='{x2:.1f}' "
                f"y2='{y2:.1f}'/>"
                for x1, y1, x2, y2 in zip(ax, ay, bx, by)
            )
            parts.append(
                f"<g stroke='#f1c40f' stroke-width='0.9' "
                f"opacity='0.75'>{lines}</g>"
            )
        if len(traj):
            x, y = px(traj)
            parts.append(
                "<polyline fill='none' stroke='#e15759' stroke-width='2.5' "
                "points='"
                + " ".join(f"{a:.1f},{b:.1f}" for a, b in zip(x, y)) + "'/>"
            )
            parts.append(
                f"<circle cx='{x[-1]:.1f}' cy='{y[-1]:.1f}' r='6' "
                f"fill='none' stroke='#f1c40f' stroke-width='2'/>"
            )
        rows = [
            f"frame      {stats['frame']}",
            f"pos mm     {stats['pos_mm']}",
            f"map        {stats['map_size']}",
            f"mutual     {stats['n_mutual']}",
            f"inliers    {stats['n_inliers']}",
            f"gated      {'YES' if stats['gated'] else 'no'}"
            f" ({stats['gated_total']} total)",
            f"dropped    {stats['n_dropped']}",
            f"keyframes  {stats['keyframes']}",
            f"loop edges {stats['loop_edges']}",
        ]
        for k, row in enumerate(rows):
            parts.append(
                f"<text x='{S + 14}' y='{34 + 24 * k}' fill='#ddd' "
                f"font-family='monospace' font-size='14'>{row}</text>"
            )
        legend = [("#e15759", "trajectory"), ("#59a14f", "gold"),
                  ("#4e79a7", "map keypoints"),
                  ("#f1c40f", "inlier correspondences")]
        for k, (c, name) in enumerate(legend):
            y0 = S - 70 + 22 * k
            parts.append(
                f"<rect x='{S + 14}' y='{y0 - 10}' width='12' height='12' "
                f"fill='{c}'/><text x='{S + 32}' y='{y0}' fill='#aaa' "
                f"font-family='monospace' font-size='13'>{name}</text>"
            )
        parts.append("</svg>")
        return "".join(parts)
