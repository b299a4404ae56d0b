from rgbd360_tpu.io.boost_archive import (  # noqa: F401
    RawFrame360,
    read_frame360_bin,
    write_frame360_bin,
)
from rgbd360_tpu.io.clams import DepthDistortionModel, load_clams_model  # noqa: F401
from rgbd360_tpu.io.calib import Calib360  # noqa: F401
