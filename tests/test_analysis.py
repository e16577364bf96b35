"""Offline analysis layer: SVG chart writer + run_analysis tool
(reference L8: test/*.m MATLAB plots, SURVEY §1 L8)."""

import json
import os
import re
import subprocess
import sys
import xml.dom.minidom

import numpy as np

from bshot_slam_tpu.viz.charts import PALETTE, save_line_chart_svg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _coords(svg: str):
    for m in re.finditer(r'<circle cx="([-\d.]+)" cy="([-\d.]+)"', svg):
        yield float(m.group(1)), float(m.group(2))


def test_line_chart_structure(tmp_path):
    path = str(tmp_path / "c.svg")
    x = list(range(10))
    series = {
        "CV": np.linspace(100, 700, 10).tolist(),
        "CVS": np.linspace(50, 400, 10).tolist(),
        "CVSN+ICP": (np.linspace(400, 90, 10) ** 1.01).tolist(),
    }
    save_line_chart_svg(path, x, series, "t", "Frame", "mm")
    svg = open(path).read()
    xml.dom.minidom.parseString(svg)  # well-formed
    # every series name appears (legend), identity not by color alone
    for name in series:
        assert name in svg
    # data marks stay inside the canvas
    w = int(re.search(r'width="(\d+)"', svg).group(1))
    h = int(re.search(r'height="(\d+)"', svg).group(1))
    for cx, cy in _coords(svg):
        assert -6 <= cx <= w + 6 and -6 <= cy <= h + 6
    # hover layer: every data marker carries a <title> tooltip
    assert svg.count("<title>") >= len(x)
    # 2px line marks
    assert 'stroke-width="2"' in svg


def test_line_chart_series_cap(tmp_path):
    path = str(tmp_path / "d.svg")
    too_many = {f"s{i}": [float(i)] * 3 for i in range(len(PALETTE) + 1)}
    try:
        save_line_chart_svg(path, [0, 1, 2], too_many, "t", "x", "y")
        raise AssertionError("expected ValueError for > palette series")
    except ValueError:
        pass


def test_line_chart_nan_and_flat(tmp_path):
    path = str(tmp_path / "e.svg")
    save_line_chart_svg(
        path, [0, 1, 2], {"a": [float("nan"), 5.0, 5.0]}, "t", "x", "y"
    )
    xml.dom.minidom.parseString(open(path).read())


def test_run_analysis_ground_e2e(tmp_path):
    out = str(tmp_path / "g")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_analysis.py"),
         "ground", "--synthetic", "2", "--n-azimuth", "128", "--cpu",
         "--vert-inits=-0.6,-1.2", "--out", out],
        capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.load(open(os.path.join(out, "ground.json")))
    assert "vert_init -0.6" in stats and len(stats["frame"]) == 2
    svg = open(os.path.join(out, "ground_accuracy.svg")).read()
    xml.dom.minidom.parseString(svg)
