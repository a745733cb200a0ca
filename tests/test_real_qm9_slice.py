"""Real-data pipeline proof (VERDICT round-1 item 6): a committed slice of
QM9-format raw data (tests/fixtures/qm9_slice: 12 hand-built molecules with
real geometries, V2000 SDF + gdb9.sdf.csv in the raw column layout) runs the
FULL pipeline: preprocess (dependency-free SDF parser) -> .npz cache ->
QM9Dataset (Hartree->eV, target normalization, ev2mev) -> pre-train and
fine-tune steps through the reference configs_clean YAMLs."""
import glob
import os

import numpy as np
import pytest

from infomax3d_tpu.cli.config import load_config
from infomax3d_tpu.cli.train import train
from infomax3d_tpu.data.cached import HAR2EV, QM9Dataset
from infomax3d_tpu.data.preprocess import preprocess_qm9

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "qm9_slice")


@pytest.fixture(scope="module")
def qm9_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("qm9real")
    out = str(root / "QM9" / "processed.npz")
    preprocess_qm9(FIXTURE, out)
    return str(root)


def test_cache_layout(qm9_root):
    import numpy as np
    z = np.load(os.path.join(qm9_root, "QM9", "processed.npz"))
    assert z["atom_slices"].shape == (13,)          # 12 molecules
    # methane: 5 atoms, 4 bonds -> 8 directed edges
    assert z["atom_slices"][1] == 5
    assert z["edge_slices"][1] == 8
    assert z["atom_features"].shape[1] == 9          # OGB code layout
    assert z["edge_features"].shape[1] == 3
    assert z["targets"].shape == (12, 19)
    # C-H bond length of the methane geometry survives into coordinates
    c = z["coordinates"][:5]
    assert abs(np.linalg.norm(c[1] - c[0]) - 1.0902) < 1e-3


def test_featurization_codes(qm9_root):
    z = np.load(os.path.join(qm9_root, "QM9", "processed.npz"))
    af = z["atom_features"]
    # methane carbon: atomic num code 5 (=Z-1), degree 4, sp3 (code 2)
    assert af[0, 0] == 5 and af[0, 2] == 4 and af[0, 6] == 2
    # acetylene carbons (mol 4, atoms at slice 12..15): sp (code 0)
    a0 = int(z["atom_slices"][3])
    assert af[a0, 0] == 5 and af[a0, 6] == 0
    # oxirane (mol 12) ring flags: O,C,C all in a 3-ring
    r0 = int(z["atom_slices"][11])
    assert af[r0, 8] == 1 and af[r0 + 1, 8] == 1 and af[r0 + 2, 8] == 1
    # methane: not in ring
    assert af[0, 8] == 0


def test_hartree_to_ev_and_normalization(qm9_root):
    path = os.path.join(qm9_root, "QM9", "processed.npz")
    ds = QM9Dataset(path, target_tasks=["homo", "r2"], normalize=True)
    assert ds.ev2mev.tolist() == [1000.0, 1.0]
    # denormalize the first molecule (methane): homo = -0.3877 Ha -> eV
    denorm = ds.targets * ds.targets_std + ds.targets_mean
    np.testing.assert_allclose(denorm[0, 0], -0.3877 * HAR2EV, rtol=1e-5)
    # r2 has no unit conversion
    np.testing.assert_allclose(denorm[0, 1], 35.36, rtol=1e-5)
    # normalized targets have ~zero mean / unit std
    np.testing.assert_allclose(ds.targets.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(ds.targets.std(axis=0), 1.0, atol=1e-4)


def test_pretrain_and_finetune_on_real_slice(qm9_root, tmp_path, monkeypatch):
    monkeypatch.setenv("INFOMAX3D_DATA", qm9_root)
    small = dict(num_epochs=1, patience=2, use_tensorboard=False,
                 eval_per_epochs=0, log_iterations=-1, batch_size=2,
                 num_train=8, num_val=2)
    pre = load_config("configs_clean/pre-train_QM9.yml",
                      dict(small, logdir=str(tmp_path / "pre")))
    res = train(pre)
    assert np.isfinite(res["NTXent"])

    ckpts = glob.glob(str(tmp_path / "pre" / "*" / "best_checkpoint.pt"))
    assert ckpts
    tune = load_config("configs_clean/tune_QM9_homo.yml",
                       dict(small, logdir=str(tmp_path / "tune"),
                            pretrain_checkpoint=ckpts[0]))
    res = train(tune)
    # denormalized MAE is in meV (homo is an eV target, ev2mev=1000): with
    # unit-std normalized targets and an untrained head the normalized error
    # is O(1), so the meV-denormalized value must be around std*1000
    ds = QM9Dataset(os.path.join(qm9_root, "QM9", "processed.npz"),
                    target_tasks=["homo"])
    scale_mev = float(ds.targets_std[0]) * 1000.0
    assert np.isfinite(res["mae_denormalized"])
    assert 0.01 * scale_mev < res["mae_denormalized"] < 100 * scale_mev
