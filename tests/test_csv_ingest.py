import numpy as np
import pandas as pd
import pytest

from tgm_tpu import DGData


def test_from_csv_full_surface(tmp_path):
    edges = pd.DataFrame(
        {"u": [0, 1, 2], "v": [1, 2, 0], "t": [10, 20, 30],
         "w1": [0.1, 0.2, 0.3], "w2": [1.0, 2.0, 3.0], "etype": [0, 1, 0]}
    )
    nodes = pd.DataFrame({"nid": [0, 2], "t": [15, 25], "f": [5.0, 6.0]})
    labels = pd.DataFrame({"nid": [1], "t": [22], "y1": [0.7], "y2": [0.3]})
    static = pd.DataFrame({"s1": [1.0, 2.0, 3.0], "ntype": [0, 0, 1]})
    for name, df in [("e", edges), ("n", nodes), ("l", labels), ("s", static)]:
        df.to_csv(tmp_path / f"{name}.csv", index=False)

    d = DGData.from_csv(
        tmp_path / "e.csv", edge_src_col="u", edge_dst_col="v", edge_time_col="t",
        edge_x_col=["w1", "w2"], edge_type_col="etype",
        node_x_file_path=tmp_path / "n.csv", node_x_nids_col="nid",
        node_x_time_col="t", node_x_col=["f"],
        node_y_file_path=tmp_path / "l.csv", node_y_nids_col="nid",
        node_y_time_col="t", node_y_col=["y1", "y2"],
        static_node_x_file_path=tmp_path / "s.csv", static_node_x_col=["s1"],
        node_type_col="ntype", time_delta="s",
    )
    assert d.num_edge_events == 3
    assert d.num_events == 6
    np.testing.assert_array_equal(d.edge_time, [10, 20, 30])
    np.testing.assert_array_equal(d.node_x_time, [15, 25])
    np.testing.assert_array_equal(d.node_y_time, [22])
    np.testing.assert_allclose(d.node_y[0], [0.7, 0.3])
    np.testing.assert_array_equal(d.edge_type, [0, 1, 0])
    np.testing.assert_array_equal(d.node_type, [0, 0, 1])
    assert d.static_node_x.shape == (3, 1)
    # unified timeline interleaves all kinds in time order
    np.testing.assert_array_equal(d.time, [10, 15, 20, 22, 25, 30])


def test_from_csv_missing_node_cols(tmp_path):
    edges = pd.DataFrame({"u": [0], "v": [1], "t": [1]})
    edges.to_csv(tmp_path / "e.csv", index=False)
    nodes = pd.DataFrame({"nid": [0], "t": [1]})
    nodes.to_csv(tmp_path / "n.csv", index=False)
    with pytest.raises(ValueError):
        DGData.from_csv(
            tmp_path / "e.csv", edge_src_col="u", edge_dst_col="v", edge_time_col="t",
            node_x_file_path=tmp_path / "n.csv",  # missing nids/time cols
        )
