"""Data ingestion: radar scan container, .bin frame IO, vendor adapters,
sequence datasets (reference L0 layer — SURVEY.md §1)."""

from icp4dradar_tpu.io.scan import RadarScan  # noqa: F401
from icp4dradar_tpu.io.bin_io import (  # noqa: F401
    read_radar_bin,
    write_radar_bin,
    frame_path,
)
from icp4dradar_tpu.io.formats import (  # noqa: F401
    RadarFields,
    adapt_point_records,
    detect_format,
)
from icp4dradar_tpu.io.dataset import (  # noqa: F401
    BinSequenceDataset,
    SyntheticSequence,
    VENDOR_PROFILES,
    VendorProfile,
)
from icp4dradar_tpu.io.rosbag import (  # noqa: F401
    RosbagReader,
    RosbagWriter,
    ImuSample,
    OdomSample,
)
from icp4dradar_tpu.io.bag_dataset import RadarBagDataset  # noqa: F401
from icp4dradar_tpu.io.synthetic_bag import write_synthetic_bag  # noqa: F401
from icp4dradar_tpu.io.pcd import read_pcd, write_pcd, PcdSequenceDataset  # noqa: F401
