"""Utils tests: metrics, trajectory file formats, logging, checkpointing."""

import json
import os

import jax.numpy as jnp
import numpy as np

from icp4dradar_tpu.geom import se3_exp
from icp4dradar_tpu.utils import (
    MetricsLogger,
    StageTimer,
    ate_rmse,
    load_checkpoint,
    read_result_csv,
    rpe,
    save_checkpoint,
    write_result_csv,
    write_rt_txt,
    write_tum,
    write_velocity_txt,
)


class TestMetrics:
    def test_ate_zero_for_identical(self, rng):
        traj = rng.normal(size=(50, 3))
        assert ate_rmse(traj, traj) < 1e-9

    def test_ate_alignment_removes_rigid_offset(self, rng):
        traj = np.cumsum(rng.normal(size=(100, 3)), 0)
        R = np.asarray(se3_exp(jnp.asarray([0, 0, 0, 0.1, 0.2, 0.3], dtype=jnp.float32)))[:3, :3]
        moved = traj @ R.T + np.array([5.0, -3.0, 2.0])
        assert ate_rmse(moved, traj, align=True) < 1e-4
        assert ate_rmse(moved, traj, align=False) > 1.0

    def test_rpe_detects_drift(self, rng):
        F = 30
        gt = np.tile(np.eye(4), (F, 1, 1))
        gt[:, 0, 3] = np.arange(F)  # 1 m/frame straight line
        est = gt.copy()
        est[:, 0, 3] = np.arange(F) * 1.1  # 10% scale drift
        t_err, r_err = rpe(est, gt)
        np.testing.assert_allclose(t_err, 0.1, atol=1e-6)
        np.testing.assert_allclose(r_err, 0.0, atol=1e-9)


class TestTrajectoryIO:
    def test_velocity_txt(self, tmp_path, rng):
        v = rng.normal(size=(10, 3))
        p = str(tmp_path / "velocity.txt")
        write_velocity_txt(p, v)
        back = np.loadtxt(p)
        np.testing.assert_allclose(back, v, rtol=1e-9)

    def test_rt_txt_12_columns(self, tmp_path, rng):
        T = np.tile(np.eye(4), (5, 1, 1))
        T[:, :3, 3] = rng.normal(size=(5, 3))
        p = str(tmp_path / "icp.txt")
        write_rt_txt(p, T)
        back = np.loadtxt(p)
        assert back.shape == (5, 12)
        np.testing.assert_allclose(back[:, 3], T[:, 0, 3], rtol=1e-9)

    def test_result_csv_roundtrip(self, tmp_path, rng):
        F = 7
        T = np.tile(np.eye(4), (F, 1, 1))
        T[:, :3, 3] = rng.normal(size=(F, 3))
        scores = rng.uniform(size=F)
        A = rng.uniform(size=F)
        b = rng.uniform(size=F)
        p = str(tmp_path / "output_result.csv")
        write_result_csv(p, T, scores, A, b)
        times, T2, s2, A2, b2 = read_result_csv(p)
        np.testing.assert_allclose(T2, T, atol=1e-5)
        np.testing.assert_allclose(s2, scores, atol=1e-5)
        # header row matches the reference's 20-column format
        header = open(p).readline()
        assert header.startswith("#time(s),Rtrans00")
        assert len(open(p).readlines()[1].split(",")) == 20

    def test_tum_format(self, tmp_path):
        T = np.tile(np.eye(4), (3, 1, 1))
        p = str(tmp_path / "odom_tum.txt")
        write_tum(p, T)
        rows = [l.split() for l in open(p)]
        assert all(len(r) == 8 for r in rows)
        np.testing.assert_allclose([float(x) for x in rows[0][4:]], [0, 0, 0, 1])


class TestLoggerTimer:
    def test_jsonl_logging(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        with MetricsLogger(p) as log:
            log.log("frame", ate=0.1)
            log.log("frame", ate=0.2)
        recs = [json.loads(l) for l in open(p)]
        assert [r["step"] for r in recs] == [0, 1]
        assert recs[1]["ate"] == 0.2

    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("x"):
            sum(range(1000))
        s = t.summary()
        assert s["x"]["count"] == 1 and s["x"]["total_s"] > 0


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path, rng):
        from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert

        m = voxel_map_create(capacity=1 << 8, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32)))
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, m, {"frame": 42})
        m2, meta = load_checkpoint(p, m)
        assert meta["frame"] == 42
        np.testing.assert_allclose(np.asarray(m2.points), np.asarray(m.points))
        assert int(jnp.sum(m2.occupied)) == int(jnp.sum(m.occupied))


class TestViz:
    def test_ply_roundtrip_header(self, tmp_path, rng):
        from icp4dradar_tpu.utils import write_ply

        pts = rng.normal(size=(20, 3)).astype(np.float32)
        p = str(tmp_path / "m.ply")
        write_ply(p, pts, rng.uniform(0, 30, 20).astype(np.float32))
        lines = open(p).read().splitlines()
        assert lines[0] == "ply"
        assert "element vertex 20" in lines
        body = lines[lines.index("end_header") + 1:]
        assert len(body) == 20 and len(body[0].split()) == 6

    def test_map_export(self, tmp_path, rng):
        import jax.numpy as jnp

        from icp4dradar_tpu.mapping import voxel_map_create, voxel_map_insert
        from icp4dradar_tpu.utils import export_map_ply

        m = voxel_map_create(capacity=1 << 8, voxel_size=0.5)
        m = voxel_map_insert(m, jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32)))
        n = export_map_ply(str(tmp_path / "map.ply"), m)
        assert n == int(np.asarray(m.occupied).sum())

    def test_html_viewer(self, tmp_path, rng):
        from icp4dradar_tpu.utils import write_html_viewer

        est = np.cumsum(rng.normal(size=(30, 3)), 0)
        p = str(tmp_path / "v.html")
        write_html_viewer(p, est, gt_positions=est + 0.1,
                          map_points=rng.normal(size=(100, 3)))
        html = open(p).read()
        assert html.startswith("<!DOCTYPE html>") and "canvas" in html


class TestDebugGuards:
    def test_assert_finite_tree(self):
        from icp4dradar_tpu.utils import assert_finite_tree

        good = {"a": np.ones(3), "b": (np.zeros(2),)}
        assert_finite_tree(good)
        bad = {"a": np.array([1.0, np.nan])}
        try:
            assert_finite_tree(bad, "state")
            assert False, "should raise"
        except FloatingPointError as e:
            assert "state" in str(e)

    def test_validate_scan(self, rng):
        from icp4dradar_tpu.io import RadarScan
        from icp4dradar_tpu.utils import validate_scan

        s = RadarScan.from_arrays(rng.normal(size=(10, 3)), max_points=16)
        validate_scan(s)
        bad_xyz = np.asarray(s.xyz).copy()
        bad_xyz[0, 0] = np.inf
        s_bad = s.replace(xyz=jnp.asarray(bad_xyz))
        try:
            validate_scan(s_bad)
            assert False
        except FloatingPointError:
            pass

    def test_checked_catches_nan(self):
        import jax

        from icp4dradar_tpu.utils import checked

        f = checked(jax.jit(lambda x: jnp.log(x)))
        f(jnp.asarray([1.0, 2.0]))  # fine
        try:
            f(jnp.asarray([-1.0]))
            assert False
        except Exception:
            pass


class TestVoxelDownsample:
    def test_one_centroid_per_leaf(self, rng):
        from icp4dradar_tpu.utils import voxel_downsample

        pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
        out = voxel_downsample(pts, leaf=0.5)
        coords = np.floor(pts / 0.5).astype(np.int64)
        n_vox = len(np.unique(coords, axis=0))
        assert out.shape == (n_vox, 3)
        # centroids stay inside their voxel
        out_coords = np.floor(out / 0.5).astype(np.int64)
        assert set(map(tuple, out_coords)) == set(map(tuple, coords))

    def test_empty(self):
        from icp4dradar_tpu.utils import voxel_downsample

        out = voxel_downsample(np.zeros((0, 3), np.float32))
        assert out.shape == (0, 3)
