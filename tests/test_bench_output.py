"""The driver machine-reads bench.py's FINAL stdout line from a
~2000-char tail capture — the r5 round shipped a line that overflowed
it and the driver recorded `parsed: null`. These tests pin the
emission contract without starting Spark."""

from __future__ import annotations

import json

import bench


def _parse_final(lines):
    return json.loads(lines[-1])


def test_final_line_compact_at_current_headline_size():
    """At the CURRENT headline size (plus pipeline + streaming
    entries) the final line keeps the per-query map and stays well
    inside the tail window."""
    names = list(bench.HEADLINE) + [
        "pipeline_full_load", "pipeline_delta_load",
        "streaming_validated_ingest", "streaming_sessionize",
    ]
    timings = {n: 123.456 for n in names}
    lines = bench.format_output_lines(timings, 999.999, 0.1, 1.234, 810.5)
    assert len(lines) == 1
    final = lines[-1]
    assert len(final) <= 1900, len(final)
    d = _parse_final(lines)
    assert d["queries"] == timings
    assert d["n_queries"] == len(names)
    assert d["drift_median"] == 1.234 and d["value_normalized"] == 810.5


def test_final_line_keeps_normalized_map_at_current_headline_size():
    """With the drift-normalized per-query map present (the r9
    contract: the driver-parsed line carries the regression signal),
    the final line holds queries_normalized; the raw map — too big to
    share the line — moves to the earlier BENCH_QUERIES line and
    BENCH_DETAIL.json, recoverable as normalized * drift_median."""
    names = list(bench.HEADLINE) + [
        "pipeline_full_load", "pipeline_delta_load",
        "streaming_validated_ingest", "streaming_sessionize",
    ]
    timings = {n: 123.456 for n in names}
    qn = {n: 100.046 for n in names}
    lines = bench.format_output_lines(timings, 999.999, 0.1, 1.234, 810.5, qn)
    final = lines[-1]
    assert len(final) <= 1900, len(final)
    d = _parse_final(lines)
    assert d["queries_normalized"] == qn
    assert d["drift_median"] == 1.234
    assert lines[0].startswith("BENCH_QUERIES: ")
    assert json.loads(lines[0][len("BENCH_QUERIES: "):]) == timings


def test_final_line_drops_query_map_when_oversized():
    """If the headline set ever outgrows the window, the query maps
    move to their own earlier lines and the final line stays
    parseable and small."""
    timings = {f"query_with_a_rather_long_name_{i:03d}": 123.456 for i in range(90)}
    lines = bench.format_output_lines(timings, 999.999, 0.1, 1.0, 999.9)
    assert len(lines) == 2
    assert lines[0].startswith("BENCH_QUERIES: ")
    assert json.loads(lines[0][len("BENCH_QUERIES: "):]) == timings
    final = lines[-1]
    assert len(final) <= 1900
    d = _parse_final(lines)
    assert "queries" not in d
    assert d["n_queries"] == 90
    # with a normalized map that ALSO can't fit, both maps get lines
    qn = {k: 123.456 for k in timings}
    lines = bench.format_output_lines(timings, 999.999, 0.1, 1.0, 999.9, qn)
    assert len(lines) == 3
    assert lines[0].startswith("BENCH_QUERIES: ")
    assert lines[1].startswith("BENCH_QUERIES_NORMALIZED: ")
    d = _parse_final(lines)
    assert "queries" not in d and "queries_normalized" not in d
    assert len(lines[-1]) <= 1900


def test_final_line_without_calibration_fields():
    """Non-sf0.1 runs (no drift pins) still emit one valid line."""
    lines = bench.format_output_lines({"q": 1.0}, 1.0, 0.01, None, None)
    d = _parse_final(lines)
    assert "drift_median" not in d and "value_normalized" not in d
    assert d["sf"] == 0.01
