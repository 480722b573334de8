"""Oxford Radar RobotCar dataset decoding — host-side I/O layer.

Replaces the reference's `parseData.py` loaders (`parseData.py:17-53,160-259`) and
the ground-truth CSV loaders (`trajectoryPlotting.py:183-237`) without OpenCV:
PNGs are decoded with PIL into numpy, metadata fields are sliced per the Oxford
format, and the clipped power matrix is padded to a lane-aligned width so the
device pipeline sees one static shape.

Raw PNG layout (400 rows x 3779 cols, uint8; `parseData.py:39-43`):
  cols 0-7   int64 little-endian UNIX timestamp per azimuth
  cols 8-9   uint16 encoder azimuth (ticks / 5600 * 2*pi radians)
  col  10    valid flag (255 = raw return, else interpolated)
  cols 11+   power readings / 255.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple

import numpy as np
from PIL import Image

from radarslampy_tpu.config import SlamConfig


class RadarFrame(NamedTuple):
    power: np.ndarray       # [A, Wpad] float32 power in [0, 1], zero-padded
    azimuths: np.ndarray    # [A] float32 encoder azimuth (radians)
    valid: np.ndarray       # [A] bool raw-return flag
    timestamps: np.ndarray  # [A] int64 per-azimuth UNIX timestamps
    frame_timestamp: int    # scan timestamp (from the filename)


def decode_radar_png(path: str, cfg: SlamConfig, raw_u8: bool = False) -> RadarFrame:
    """Decode one Oxford radar PNG into a lane-padded polar power matrix.

    `raw_u8=True` keeps power as the raw PNG bytes so the /255 dequantisation
    runs on the accelerator after a 4x smaller host->device transfer."""
    raw = np.asarray(Image.open(path))
    if raw.ndim == 3:  # tolerate RGB-saved PNGs
        raw = raw[..., 0]
    timestamps = raw[:, :8].copy().view(np.int64).reshape(-1)
    azimuths = (
        raw[:, 8:10].copy().view(np.uint16).reshape(-1).astype(np.float32)
        / float(cfg.encoder_size)
        * 2.0
        * np.pi
    )
    valid = raw[:, 10] == 255
    bins = cfg.clipped_range_bins
    dtype = np.uint8 if raw_u8 else np.float32
    power = raw[:, 11 : 11 + bins]
    if not raw_u8:
        power = power.astype(np.float32) / 255.0
    padded = np.zeros((cfg.num_azimuths, cfg.polar_width_padded), dtype=dtype)
    padded[:, : power.shape[1]] = power
    stamp = int(os.path.basename(path)[:-4])
    return RadarFrame(padded, azimuths, valid, timestamps, stamp)


def radar_image_paths(data_dir: str, timestamp_file: str) -> List[str]:
    """List radar PNG paths from a radar.timestamps file (parseData.py:208-226)."""
    paths = []
    with open(timestamp_file) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 2 and parts[1]:
                paths.append(os.path.join(data_dir, parts[0] + ".png"))
    return paths


def sequence_paths(root: str, sequence: str) -> dict:
    """Standard layout: <root>/<sequence>/{radar/, radar.timestamps, gt/, gps/}."""
    base = os.path.join(root, sequence)
    return {
        "radar": os.path.join(base, "radar"),
        "timestamps": os.path.join(base, "radar.timestamps"),
        "gt": os.path.join(base, "gt", "radar_odometry.csv"),
        "gps": os.path.join(base, "gps", "gps.csv"),
    }


def load_gt_trajectory(csv_path: str):
    """Integrate the GT odometry CSV into absolute poses.

    Mirrors `getGroundTruthTrajectory` (`trajectoryPlotting.py:183-213`): per row
    reads (dx, dy, dyaw) at columns (2, 3, 7) keyed by destination_radar_timestamp
    (column 9), chains them as planar motions, and wraps the heading.  Roll/pitch
    are ignored exactly as the reference does.

    Returns (timestamps [N] int64, poses [N, 3] float64, deltas [N, 3] float64).
    """
    rows = np.genfromtxt(csv_path, delimiter=",", skip_header=1)
    dx, dy, dyaw = rows[:, 2], rows[:, 3], rows[:, 7]
    stamps = rows[:, 9].astype(np.int64)
    n = len(stamps)
    poses = np.zeros((n, 3))
    x = y = th = 0.0
    for i in range(n):
        x += dx[i] * np.cos(th) - dy[i] * np.sin(th)
        y += dx[i] * np.sin(th) + dy[i] * np.cos(th)
        th += dyaw[i]
        th = (th + np.pi) % (2 * np.pi) - np.pi
        poses[i] = (x, y, th)
    deltas = np.stack([dx, dy, dyaw], axis=1)
    return stamps, poses, deltas


def load_gps_trajectory(csv_path: str):
    """GPS csv loader -> (timestamps [N], xy [N, 2] metres, first-fix anchored).

    The Oxford gps.csv layout is (timestamp, num_satellites, lat, lon, alt,
    ..., northing, easting, down, utm_zone); metric positions are UTM
    northing/easting at columns 8/9.  The reference reads columns 2/3 —
    latitude/longitude in degrees — straight into x/y
    (`trajectoryPlotting.py:216-237`), a units bug it never hits because the
    GPS overlay is only eyeballed; fixed here.  xy is re-anchored to the
    first fix (easting -> x, northing -> y).
    """
    rows = np.genfromtxt(csv_path, delimiter=",", skip_header=1,
                         usecols=(0, 8, 9))
    rows = np.atleast_2d(rows)
    stamps = rows[:, 0].astype(np.int64)
    xy = np.stack([rows[:, 2], rows[:, 1]], axis=1)
    return stamps, xy - xy[0]
