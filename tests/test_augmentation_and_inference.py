"""Augmentation collates + fingerprint inference tests."""
import numpy as np

from infomax3d_tpu.data.loader import get_collate
from infomax3d_tpu.data.synthetic import SyntheticMolecules
from infomax3d_tpu.graphs.batch import BucketSpec


def items(num=4, seed=0):
    ds = SyntheticMolecules(num, seed=seed)
    return [{"graph2d": ds.graph2d(i), "graph3d": ds.graph3d(i)}
            for i in range(num)]


B2 = BucketSpec(4, 128, 512)
B3 = BucketSpec(4, 128, 4096)


def test_noised_distances_collate():
    rng = np.random.default_rng(0)
    out = get_collate("noised_distances_collate")(
        items(), B2, bucket3d=B3, std=0.2, num_noised=1, rng=rng)
    g3, noisy = out["graph3d"], out["noisy3d"]
    m = np.asarray(g3.edge_mask)
    d0 = np.asarray(g3.edge_dist)[m]
    d1 = np.asarray(noisy.edge_dist)[np.asarray(noisy.edge_mask)]
    assert d0.shape == d1.shape
    assert 0.05 < np.std(d1 - d0) < 0.5


def test_noised_coordinates_collate():
    rng = np.random.default_rng(0)
    out = get_collate("noised_coordinates_collate")(
        items(), B2, bucket3d=B3, std=0.1, num_noised=1, rng=rng)
    noisy = out["noisy3d"]
    # distances recomputed from noised coords must satisfy triangle consistency
    m = np.asarray(noisy.edge_mask)
    s = np.asarray(noisy.senders)[m]
    r = np.asarray(noisy.receivers)[m]
    c = np.asarray(noisy.coords)
    np.testing.assert_allclose(np.asarray(noisy.edge_dist)[m],
                               np.linalg.norm(c[s] - c[r], axis=-1), rtol=1e-5)


def test_node_drop_collates():
    rng = np.random.default_rng(0)
    out = get_collate("node_drop_3d_collate")(items(), B2, bucket3d=B3,
                                              num_drop=3, rng=rng)
    assert out["graph3d"].node_mask.sum() <= out["graph2d"].node_mask.sum()
    out2 = get_collate("node_drop_2d3d_collate")(items(), B2, bucket3d=B3,
                                                 drop_ratio=0.2, rng=rng)
    full = sum(it["graph2d"]["node_feat"].shape[0] for it in items())
    assert int(out2["graph2d"].node_mask.sum()) < full


def test_fingerprint_inference(tmp_path):
    from infomax3d_tpu.cli.config import load_config
    from infomax3d_tpu.cli.inference import inference
    args = load_config(None, dict(
        dataset="synthetic", dataset_params={"num": 40, "n_max": 16},
        batch_size=16, model_type="PNA",
        model_parameters=dict(
            target_dim=32, hidden_dim=16, aggregators=["mean", "max"],
            scalers=["identity"], readout_aggregators=["mean"],
            propagation_depth=1, readout_layers=1, readout_batchnorm=False),
        output_dir=str(tmp_path)))
    fp = inference(args)
    assert fp.shape == (40, 32)
    assert np.isfinite(fp).all()
    assert (tmp_path / "fingerprints.npy").exists()


def test_analysis_singular_values(tmp_path):
    """cli/analysis.py (reference singular_value_plots.py:1-110): fingerprint
    inference -> centered singular-value spectrum -> json (+png)."""
    import json

    import yaml

    from infomax3d_tpu.cli.analysis import main, singular_value_spectrum

    cfg = dict(
        dataset="synthetic", dataset_params={"num": 30, "n_max": 14},
        batch_size=16, model_type="PNA",
        model_parameters=dict(
            target_dim=24, hidden_dim=16, aggregators=["mean", "max"],
            scalers=["identity"], readout_aggregators=["mean"],
            propagation_depth=1, readout_layers=1, readout_batchnorm=False),
        output_dir=str(tmp_path))
    cfg_path = tmp_path / "analysis.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    payload = main(["--config", str(cfg_path)])
    assert payload["n_samples"] == 30 and payload["dim"] == 24
    sv = np.asarray(payload["singular_values_pct"])
    assert np.isfinite(sv).all() and abs(sv.sum() - 100.0) < 1e-3
    assert (sv[:-1] >= sv[1:] - 1e-9).all()      # descending spectrum
    assert json.load(open(tmp_path / "singular_values.json"))

    # spectrum math: centered identity has rank 3 -> three equal shares
    eye = np.eye(4, dtype=np.float32)
    sp = singular_value_spectrum(eye)
    np.testing.assert_allclose(sp, [100 / 3] * 3 + [0.0], atol=1e-4)
