"""IO tests: bin round-trip, format adapter, scan container, synthetic data."""

import numpy as np
import pytest

from icp4dradar_tpu.io import (
    BinSequenceDataset,
    RadarScan,
    SyntheticSequence,
    adapt_point_records,
    detect_format,
    frame_path,
    read_radar_bin,
    write_radar_bin,
)


class TestBinIO:
    def test_roundtrip(self, rng, tmp_path):
        rec = rng.normal(size=(137, 5)).astype(np.float32)
        p = str(tmp_path / "data" / "radar_pointcloud_0.bin")
        write_radar_bin(p, rec)
        back = read_radar_bin(p)
        np.testing.assert_array_equal(back, rec)

    def test_missing_file_empty(self, tmp_path):
        # ref behavior: missing path -> empty buffer (iterative_closest_point.cpp:77-81)
        out = read_radar_bin(str(tmp_path / "nope.bin"))
        assert out.shape == (0, 5)

    def test_partial_record_dropped(self, tmp_path):
        raw = np.arange(12, dtype=np.float32)  # 2 full records + 2 floats
        p = str(tmp_path / "x.bin")
        raw.tofile(p)
        out = read_radar_bin(p)
        assert out.shape == (2, 5)


class TestFormats:
    def test_detect_priority(self):
        assert detect_format(["x", "y", "z", "snr_db", "noise_db", "v_doppler_mps"]) == "rio"
        assert detect_format(["x", "y", "z", "intensity", "velocity"]) == "ti_mmwave"
        assert detect_format(
            ["x", "y", "z", "Doppler", "Range", "Power", "Alpha", "Beta"]
        ) == "oculii"
        assert detect_format(["x", "y", "z", "intensity", "range", "doppler"]) == "coloradar"
        assert detect_format(["x", "y", "z"]) is None

    def test_ti_mmwave_axis_swap(self, rng):
        # ref: x = -y_raw, y = x_raw (radar_odometry.cpp:504-505)
        cols = {
            "x": np.array([1.0]), "y": np.array([2.0]), "z": np.array([3.0]),
            "intensity": np.array([9.0]), "velocity": np.array([-1.0]),
        }
        f = adapt_point_records(cols)
        np.testing.assert_allclose(f.xyz[0], [-2.0, 1.0, 3.0])
        assert f.noise_db[0] == -1.0

    def test_rio_range_from_norm(self):
        cols = {
            "x": np.array([3.0]), "y": np.array([4.0]), "z": np.array([0.0]),
            "snr_db": np.array([1.0]), "noise_db": np.array([2.0]),
            "v_doppler_mps": np.array([0.5]),
        }
        f = adapt_point_records(cols)
        np.testing.assert_allclose(f.range, [5.0])

    def test_unsupported_raises(self):
        with pytest.raises(ValueError, match="unsupported"):
            adapt_point_records({"x": np.zeros(1), "y": np.zeros(1), "foo": np.zeros(1)})


class TestRadarScan:
    def test_padding_and_mask(self, rng):
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        s = RadarScan.from_arrays(xyz, max_points=256)
        assert s.xyz.shape == (256, 3)
        assert float(s.num_valid) == 100.0

    def test_truncation(self, rng):
        xyz = rng.normal(size=(300, 3)).astype(np.float32)
        s = RadarScan.from_arrays(xyz, max_points=256)
        assert float(s.num_valid) == 256.0

    def test_spherical_derivations(self):
        # point straight ahead at 10 m, one up at 45 deg elevation
        xyz = np.array([[10.0, 0.0, 0.0], [1.0, 0.0, 1.0]], dtype=np.float32)
        s = RadarScan.from_arrays(xyz, max_points=4)
        np.testing.assert_allclose(np.asarray(s.range)[:2], [10.0, np.sqrt(2.0)], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.azimuth)[:2], [0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s.elevation)[:2], [0.0, np.pi / 4], atol=1e-6
        )
        # direction == K-matrix rows (iterative_closest_point.cpp:418-420)
        d = np.asarray(s.direction)[1]
        np.testing.assert_allclose(d, [np.sqrt(0.5), 0.0, np.sqrt(0.5)], atol=1e-6)


class TestSyntheticAndDataset:
    def test_sequence_writes_and_reads(self, tmp_path):
        seq = SyntheticSequence(num_frames=3, max_points=512, num_landmarks=3000)
        seq.write_bin_sequence(str(tmp_path))
        ds = BinSequenceDataset(str(tmp_path), max_points=512, use_native=False)
        assert len(ds) == 3
        s0 = ds[0]
        ref = seq.scan(0)
        assert abs(float(s0.num_valid) - float(ref.num_valid)) < 1e-6

    def test_doppler_consistent_with_ego_velocity(self):
        seq = SyntheticSequence(
            num_frames=5, max_points=1024, num_landmarks=8000,
            doppler_noise=0.0, dynamic_fraction=0.0,
        )
        s = seq.scan(2)
        v = seq.ego_velocity(2)
        d = np.asarray(s.direction)
        m = np.asarray(s.mask) > 0.5
        pred = d[m] @ v
        np.testing.assert_allclose(np.asarray(s.doppler)[m], pred, atol=1e-2)

    def test_dynamic_truth_alignment(self):
        seq = SyntheticSequence(num_frames=3, max_points=512, num_landmarks=4000,
                                dynamic_fraction=0.2, doppler_noise=0.0)
        s = seq.scan(1)
        dyn = seq.dynamic_truth(1)
        v = seq.ego_velocity(1)
        d = np.asarray(s.direction)
        resid = np.asarray(s.doppler) - d @ v
        m = np.asarray(s.mask) > 0.5
        # dynamic points have big positive residual; static ones ~0
        assert resid[m & dyn].min() > 0.5
        assert np.abs(resid[m & ~dyn]).max() < 0.5


class TestPcd:
    def test_binary_roundtrip(self, tmp_path, rng):
        from icp4dradar_tpu.io import read_pcd, write_pcd

        cols = {
            "x": rng.normal(size=50).astype(np.float32),
            "y": rng.normal(size=50).astype(np.float32),
            "z": rng.normal(size=50).astype(np.float32),
            "doppler": rng.normal(size=50).astype(np.float32),
        }
        p = str(tmp_path / "a.pcd")
        write_pcd(p, cols, binary=True)
        back = read_pcd(p)
        for k in cols:
            np.testing.assert_allclose(back[k], cols[k], atol=0)

    def test_ascii_roundtrip(self, tmp_path, rng):
        from icp4dradar_tpu.io import read_pcd, write_pcd

        cols = {"x": rng.normal(size=10).astype(np.float32),
                "y": rng.normal(size=10).astype(np.float32),
                "z": rng.normal(size=10).astype(np.float32)}
        p = str(tmp_path / "b.pcd")
        write_pcd(p, cols, binary=False)
        back = read_pcd(p)
        np.testing.assert_allclose(back["x"], cols["x"], atol=1e-5)

    def test_pcd_sequence_dataset(self, tmp_path, rng):
        from icp4dradar_tpu.io import write_pcd
        from icp4dradar_tpu.io.pcd import PcdSequenceDataset

        for k in range(3):
            cols = {
                "x": rng.normal(size=20).astype(np.float32),
                "y": rng.normal(size=20).astype(np.float32),
                "z": rng.normal(size=20).astype(np.float32),
                "intensity": rng.uniform(0, 30, 20).astype(np.float32),
                "doppler": rng.normal(size=20).astype(np.float32),
            }
            write_pcd(str(tmp_path / "pcd" / f"{k:05d}.pcd"), cols)
        ds = PcdSequenceDataset(str(tmp_path), max_points=64)
        assert len(ds) == 3
        s = ds[1]
        assert float(s.num_valid) == 20.0

    def test_cli_routes_pcd_layout(self, tmp_path, rng):
        """run_odometry --dataset <folder> must sniff the reference PCD
        layout (<folder>/pcd/%05d.pcd, ref USE_PCD_FILES at
        src/iterative_closest_point.cpp:269-299) and route
        PcdSequenceDataset; --dataset-format pcd forces it."""
        import argparse

        from icp4dradar_tpu.io import write_pcd
        from icp4dradar_tpu.models.run_odometry import build_scans

        for k in range(3):
            cols = {
                "x": rng.normal(size=16).astype(np.float32),
                "y": rng.normal(size=16).astype(np.float32),
                "z": rng.normal(size=16).astype(np.float32),
                "intensity": rng.uniform(0, 30, 16).astype(np.float32),
                "doppler": rng.normal(size=16).astype(np.float32),
            }
            write_pcd(str(tmp_path / "pcd" / f"{k:05d}.pcd"), cols)
        for fmt in ("auto", "pcd"):
            args = argparse.Namespace(
                bag=None, dataset=str(tmp_path), dataset_format=fmt,
                max_points=64, synthetic=0, landmarks=0, seed=0)
            scans, gt, priors = build_scans(args)
            assert scans.xyz.shape == (3, 64, 3)
            assert float(scans.mask.sum()) == 48.0
