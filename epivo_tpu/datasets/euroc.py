"""EuRoC MAV dataset adapter: CSV ingestion, quaternion GT, undistortion.

Replaces the reference's EuRoC path (`euroc.cpp:21-84,87-175,229-252`):
comma-separated CSV with header, image timestamp list, quaternion-to-R, the
body-camera extrinsic, radial-tangential undistortion via precomputed remap
grids, and GT association by nearest timestamp (the reference uses a
hand-tuned start-index heuristic and fixed tolerance at `euroc.cpp:229-252`;
we do exact nearest-neighbor association on timestamps, strictly stronger).

The undistort/rectify map is computed once on host (numpy) and applied per
frame; map application is a dense separable-friendly warp done on host
alongside PNG decode (device code sees clean pinhole images, keeping the
device pipeline shape-static and gather-free).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np

from epivo_tpu.geometry.camera import Pinhole

# EuRoC cam0 calibration (ref `euroc.cpp:92-101`).
EUROC_CAM0_K = np.array(
    [[458.654, 0.0, 367.215], [0.0, 457.296, 248.375], [0.0, 0.0, 1.0]]
)
EUROC_CAM0_DIST = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
# Body->cam0 extrinsic T_BS^-1 (ref T_DC, `euroc.cpp:119-124`).
EUROC_T_BS = np.array(
    [
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def quat_to_R(qw, qx, qy, qz) -> np.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix (ref `euroc.cpp:69-84`)."""
    n = np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )


def undistort_map(K: np.ndarray, dist: np.ndarray, shape, K_new: np.ndarray | None = None):
    """Remap grids (map_x, map_y) for radial-tangential undistortion.

    Equivalent to cv::initUndistortRectifyMap (ref `euroc.cpp:104-111`):
    for each destination pixel, the source position in the distorted image.
    """
    H, W = shape
    K_new = K if K_new is None else K_new
    k1, k2, p1, p2 = dist[:4]
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    # normalized coords in the new (undistorted) camera
    x = (xx - K_new[0, 2]) / K_new[0, 0]
    y = (yy - K_new[1, 2]) / K_new[1, 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    map_x = K[0, 0] * x_d + K[0, 2]
    map_y = K[1, 1] * y_d + K[1, 2]
    return map_x.astype(np.float32), map_y.astype(np.float32)


def remap(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    """Bilinear remap (host-side, cv::remap equivalent, `euroc.cpp:170-175`)."""
    H, W = img.shape
    x0 = np.clip(np.floor(map_x).astype(np.int64), 0, W - 2)
    y0 = np.clip(np.floor(map_y).astype(np.int64), 0, H - 2)
    fx = np.clip(map_x - x0, 0.0, 1.0)
    fy = np.clip(map_y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    oob = (map_x < 0) | (map_x > W - 1) | (map_y < 0) | (map_y > H - 1)
    out[oob] = 0.0
    return out.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class EurocSequence:
    root: str  # e.g. ".../V2_01_easy" containing mav0/
    cam: str = "cam0"

    @property
    def cam_dir(self) -> str:
        return os.path.join(self.root, "mav0", self.cam, "data")

    @property
    def cam_csv(self) -> str:
        return os.path.join(self.root, "mav0", self.cam, "data.csv")

    @property
    def gt_csv(self) -> str:
        return os.path.join(
            self.root, "mav0", "state_groundtruth_estimate0", "data.csv"
        )

    def exists(self) -> bool:
        return os.path.isdir(self.cam_dir)

    def image_list(self):
        """[(timestamp_ns, filename)] from the cam data.csv
        (ref `load_fns`, `euroc.cpp:45-66`)."""
        out = []
        with open(self.cam_csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                parts = line.strip().split(",")
                if len(parts) >= 2:
                    out.append((int(parts[0]), parts[1]))
        return out

    def load_gt(self):
        """(timestamps [N], poses [N, 4, 4] world-from-body) from the GT CSV
        (ref `load_csv` + quaternion conversion, `euroc.cpp:21-42,69-84`)."""
        ts, poses = [], []
        with open(self.gt_csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                v = np.fromstring(line, sep=",")
                if v.size < 8:
                    continue
                T = np.eye(4)
                T[:3, 3] = v[1:4]
                T[:3, :3] = quat_to_R(v[4], v[5], v[6], v[7])
                ts.append(int(v[0]))
                poses.append(T)
        return np.asarray(ts), np.stack(poses)

    def load_gt_cam0(self):
        """World-from-cam0 GT poses: T_WB @ T_BS (ref applies T_DC at
        `euroc.cpp:259-263`)."""
        ts, T_WB = self.load_gt()
        return ts, T_WB @ EUROC_T_BS[None]

    def load_image(self, fname: str) -> np.ndarray:
        from PIL import Image

        with Image.open(os.path.join(self.cam_dir, fname)) as im:
            return np.asarray(im.convert("L"), dtype=np.float32)

    def undistorted_frames(self, start: int = 0, stop: int | None = None):
        """Yield (timestamp, undistorted image) pairs."""
        imgs = self.image_list()[start:stop]
        maps = None
        for ts, fn in imgs:
            img = self.load_image(fn)
            if maps is None:
                maps = undistort_map(EUROC_CAM0_K, EUROC_CAM0_DIST, img.shape)
            yield ts, remap(img, *maps)


def associate(ts_query: np.ndarray, ts_ref: np.ndarray, tol_ns: int = 5_000_000):
    """Nearest-timestamp association: for each query, index into ref (or -1).

    Replaces the reference's start-offset heuristic `9.25*(i-28)` and fixed
    tolerance (`euroc.cpp:229-252`) with exact nearest-neighbor association.
    """
    idx = np.searchsorted(ts_ref, ts_query)
    idx = np.clip(idx, 1, len(ts_ref) - 1)
    left = ts_ref[idx - 1]
    right = ts_ref[idx]
    choose_left = (ts_query - left) < (right - ts_query)
    best = np.where(choose_left, idx - 1, idx)
    dt = np.abs(ts_ref[best] - ts_query)
    return np.where(dt <= tol_ns, best, -1)
