"""Data pipelines: PU1K/PU-GAN h5 loaders, tfrecord codec, PUGeo patches."""

import numpy as np
import pytest

from puflow_tpu.data.pu1k import PU1KDataset
from puflow_tpu.data.pugan import PUGANDataset
from puflow_tpu.data.pugeo import PUGeoDataset
from puflow_tpu.data.tfrecord import (
    build_example_floats,
    parse_example_floats,
    read_records,
    write_records,
)

h5py = pytest.importorskip("h5py")


def _make_h5(path, n=40, num_point=64, ratio=4):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        base = rng.rand(n, num_point * ratio, 3).astype(np.float32) * 2 + 1
        f[f"poisson_{num_point}"] = base[:, :num_point]
        f[f"poisson_{num_point * ratio}"] = base  # also the 4x key here
    return path


class TestPu1k:
    def test_normalisation_and_batches(self, tmp_path):
        path = _make_h5(str(tmp_path / "pu1k.h5"))
        ds = PU1KDataset(path, batch_size=8, num_point=64, up_ratio=4,
                         augment=False)
        # input-frame normalisation: inputs inside the unit sphere
        assert np.abs(np.linalg.norm(ds.inp[..., :3], axis=-1)).max() <= 1 + 1e-5
        batches = list(ds.epoch())
        assert len(batches) == 5
        sp, de = batches[0]
        assert sp.shape == (8, 64, 3) and de.shape == (8, 256, 3)

    def test_augment_changes_data_deterministically(self, tmp_path):
        path = _make_h5(str(tmp_path / "pu1k.h5"))
        a = list(PU1KDataset(path, 8, 64, 4, augment=True, seed=7).epoch())
        b = list(PU1KDataset(path, 8, 64, 4, augment=True, seed=7).epoch())
        c = list(PU1KDataset(path, 8, 64, 4, augment=False, seed=7).epoch())
        np.testing.assert_array_equal(a[0][0], b[0][0])
        assert not np.allclose(a[0][0], c[0][0])


class TestPugan:
    def test_gt_frame_normalisation(self, tmp_path):
        path = _make_h5(str(tmp_path / "pugan.h5"))
        ds = PUGANDataset(path, batch_size=8, patch_num_point=64,
                          up_ratio=4, augment=False)
        # GT-frame normalisation: gt inside unit sphere
        assert np.linalg.norm(ds.gt[..., :3], axis=-1).max() <= 1 + 1e-5
        sp, de = next(iter(ds.epoch()))
        assert sp.shape == (8, 64, 3) and de.shape == (8, 256, 3)
        # rotation always applied -> z-rotated batches differ from raw
        raw = ds.inp[:8, :, :3]
        assert not np.allclose(sp, raw)


class TestTfrecord:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(1)
        feats = {"res_100": rng.rand(300).astype(np.float32),
                 "res_400": rng.rand(1200).astype(np.float32)}
        payload = build_example_floats(feats)
        parsed = parse_example_floats(payload)
        np.testing.assert_allclose(parsed["res_100"], feats["res_100"])
        np.testing.assert_allclose(parsed["res_400"], feats["res_400"])

        path = str(tmp_path / "t.tfrecord")
        write_records(path, [payload, payload])
        records = list(read_records(path))
        assert len(records) == 2
        assert records[0] == payload


class TestPugeo:
    def _make_shards(self, tmp_path, n_shapes=4):
        rng = np.random.RandomState(2)
        payloads = []
        for _ in range(n_shapes):
            lo = rng.rand(500, 3).astype(np.float32)
            hi = np.repeat(lo, 4, axis=0) + 0.01 * rng.randn(2000, 3).astype(
                np.float32)
            payloads.append(build_example_floats({
                "res_500": lo.ravel(), "res_2000": hi.ravel()}))
        path = str(tmp_path / "res_500_res_2000_p64_shard.tfrecord")
        write_records(path, payloads)
        return path

    def test_patch_extraction(self, tmp_path):
        path = self._make_shards(tmp_path)
        ds = PUGeoDataset(path, batch_size=4, num_in_point=64, up_ratio=4,
                          num_shape_point=500, num_batches=3, augment=False)
        batches = list(ds.epoch())
        assert len(batches) == 3
        sp, de = batches[0]
        assert sp.shape == (4, 64, 3) and de.shape == (4, 256, 3)
        # label-frame normalisation: labels within unit sphere
        assert np.linalg.norm(de, axis=-1).max() <= 1 + 1e-5
        # patches are local: input patch centroid near label patch centroid
        assert np.linalg.norm(sp.mean(1), axis=-1).max() < 0.6


def test_train_cli_synthetic_smoke(tmp_path):
    from puflow_tpu.cli.train_pu1k import main

    trainer = main([
        "--synthetic", "2", "--max_epochs", "1", "--batch_size", "8",
        "--checkpoint", str(tmp_path / "ck.npz"),
    ])
    assert len(trainer.history) == 1
    assert (tmp_path / "ck-epoch1.npz").exists()
