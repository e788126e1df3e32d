"""Native C++ loader tests: build, correctness vs numpy reader, prefetch."""

import numpy as np
import pytest

from icp4dradar_tpu.io import BinSequenceDataset, SyntheticSequence


@pytest.fixture(scope="module")
def native_lib():
    try:
        from icp4dradar_tpu.native import build_native

        build_native()
    except Exception as e:  # toolchain missing -> skip, dataset falls back
        pytest.skip(f"native build unavailable: {e}")


class TestNativeLoader:
    def test_matches_numpy_reader(self, tmp_path, native_lib):
        from icp4dradar_tpu.native import NativeBinLoader

        seq = SyntheticSequence(num_frames=5, max_points=512, num_landmarks=3000)
        seq.write_bin_sequence(str(tmp_path))
        nl = NativeBinLoader(str(tmp_path), max_points=512)
        assert nl.num_frames == 5
        ds = BinSequenceDataset(str(tmp_path), max_points=512, use_native=False)
        for k in range(5):
            xyz, intensity, doppler, n = nl.load(k)
            ref = ds.raw_frame(k)
            assert n == min(len(ref), 512)
            np.testing.assert_allclose(xyz[:n], ref[:n, :3], atol=0)
            np.testing.assert_allclose(intensity[:n], ref[:n, 3], atol=0)
            np.testing.assert_allclose(doppler[:n], ref[:n, 4], atol=0)
        nl.close()

    def test_truncates_to_max_points(self, tmp_path, native_lib):
        from icp4dradar_tpu.io.bin_io import frame_path, write_radar_bin
        from icp4dradar_tpu.native import NativeBinLoader

        rec = np.random.default_rng(0).normal(size=(300, 5)).astype(np.float32)
        write_radar_bin(frame_path(str(tmp_path), 0), rec)
        nl = NativeBinLoader(str(tmp_path), max_points=100)
        xyz, _, _, n = nl.load(0)
        assert n == 100
        np.testing.assert_allclose(xyz, rec[:100, :3], atol=0)
        nl.close()

    def test_out_of_range_raises(self, tmp_path, native_lib):
        from icp4dradar_tpu.io.bin_io import frame_path, write_radar_bin
        from icp4dradar_tpu.native import NativeBinLoader

        write_radar_bin(frame_path(str(tmp_path), 0),
                        np.zeros((10, 5), np.float32))
        nl = NativeBinLoader(str(tmp_path), max_points=32)
        with pytest.raises(IndexError):
            nl.load(5)
        nl.close()

    def test_dataset_uses_native(self, tmp_path, native_lib):
        seq = SyntheticSequence(num_frames=3, max_points=256, num_landmarks=2000)
        seq.write_bin_sequence(str(tmp_path))
        ds = BinSequenceDataset(str(tmp_path), max_points=256, use_native=True)
        assert ds._native is not None
        s = ds[1]
        ds2 = BinSequenceDataset(str(tmp_path), max_points=256, use_native=False)
        s2 = ds2[1]
        np.testing.assert_allclose(np.asarray(s.xyz), np.asarray(s2.xyz))

    def test_sequential_stream_prefetch(self, tmp_path, native_lib):
        from icp4dradar_tpu.native import NativeBinLoader

        seq = SyntheticSequence(num_frames=20, max_points=256, num_landmarks=2000)
        seq.write_bin_sequence(str(tmp_path))
        nl = NativeBinLoader(str(tmp_path), max_points=256, prefetch_depth=4)
        total = 0
        for k in range(20):
            _, _, _, n = nl.load(k)
            total += n
        assert total > 0
        nl.close()
