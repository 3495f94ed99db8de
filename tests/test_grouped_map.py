"""applyInPandas grouped-map vs the pure-Catalyst window twin."""

from __future__ import annotations

from robin_sparkles_spark.operators.grouped_map import (
    user_event_zscores,
    user_event_zscores_window,
)


def test_grouped_map_matches_window_twin(spark, sf_dir):
    pandas_side = {
        r.event_id: r.zscore for r in user_event_zscores(spark, sf_dir).collect()
    }
    window_side = {
        r.event_id: r.zscore
        for r in user_event_zscores_window(spark, sf_dir).collect()
    }
    assert pandas_side.keys() == window_side.keys()
    for eid, z in window_side.items():
        assert abs(pandas_side[eid] - z) < 1e-9  # float-accumulation slack
