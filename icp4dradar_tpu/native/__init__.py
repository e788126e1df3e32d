"""Native C++ host runtime: prefetching radar frame loader.

Compiled on first use with g++ (ctypes ABI — no pybind11 dependency);
`BinSequenceDataset` falls back to pure-numpy reads if the toolchain is
unavailable.
"""

from icp4dradar_tpu.native.loader import NativeBinLoader, build_native  # noqa: F401
