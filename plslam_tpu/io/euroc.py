"""EuRoC MAV stereo dataset reader with rectification.

Behavioral spec: reference ``src2/dataset.cpp`` — regex-numeric filename
sort (getSortedImages :51), offset/count/step decimation (ctor :88),
nanosecond timestamps from the cam0 CSV (:144-176), rectify-on-read
(nextFrame :183) — and ``src2/pinholeStereoCamera.cpp`` :30-129 for the
EuRoC Kl/Kr/R/t calibration form (stereoRectify + undistort maps).

Host side uses cv2 only to compute the rectification transforms once; the
per-frame remap can run either on host (cv2) or on device
(ops/image.remap with the precomputed float maps).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

try:
    import yaml
except Exception:  # pragma: no cover
    yaml = None


@dataclass
class RectifiedCalib:
    fx: float
    fy: float
    cx: float
    cy: float
    baseline: float
    width: int
    height: int
    map_l: tuple  # (map_x, map_y) float32 arrays
    map_r: tuple
    identity_maps: bool = False  # already-rectified input: skip remap


def load_euroc_calib(params_file: str) -> RectifiedCalib:
    """Parse a reference dataset_params.yaml and build rectification maps.

    Both calibration forms of pinholeStereoCamera.cpp:30-129 are handled:
    the EuRoC Kl/Kr/Dl/Dr/R/t form (stereoRectify + undistort maps) and
    the already-rectified fx/fy/cx/cy/bl scalar form used by the KITTI /
    asusxtion / perceptin parameter files (identity maps)."""
    assert yaml is not None
    with open(params_file) as f:
        # yaml-cpp tolerates literal TABs (euroc_params.yaml ships with
        # two inside the R matrix); strict YAML does not — normalize
        data = yaml.safe_load(f.read().replace("\t", " "))
    c = data["cam0"]
    w, h = int(c["cam_width"]), int(c["cam_height"])

    if "Kl" not in c:
        # fx/fy scalar form: images are already rectified; maps = identity
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        ident = (gx, gy)
        return RectifiedCalib(
            fx=float(c["cam_fx"]), fy=float(c["cam_fy"]),
            cx=float(c["cam_cx"]), cy=float(c["cam_cy"]),
            baseline=float(c["cam_bl"]), width=w, height=h,
            map_l=ident, map_r=ident, identity_maps=True)

    assert cv2 is not None

    def K_of(v):
        fx, fy, cx, cy = v
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)

    Kl = K_of(c["Kl"])
    Kr = K_of(c["Kr"])
    Dl = np.asarray(c["Dl"], np.float64)
    Dr = np.asarray(c["Dr"], np.float64)
    R = np.asarray(c["R"], np.float64).reshape(3, 3)
    t = np.asarray(c["t"], np.float64).reshape(3, 1)
    Rl, Rr, Pl, Pr, Q, _, _ = cv2.stereoRectify(
        Kl, Dl, Kr, Dr, (w, h), R, t, flags=cv2.CALIB_ZERO_DISPARITY, alpha=0)
    m1l, m2l = cv2.initUndistortRectifyMap(Kl, Dl, Rl, Pl, (w, h), cv2.CV_32FC1)
    m1r, m2r = cv2.initUndistortRectifyMap(Kr, Dr, Rr, Pr, (w, h), cv2.CV_32FC1)
    fx, fy = Pl[0, 0], Pl[1, 1]
    cx, cy = Pl[0, 2], Pl[1, 2]
    baseline = abs(Pr[0, 3] / Pr[0, 0])
    return RectifiedCalib(fx=fx, fy=fy, cx=cx, cy=cy, baseline=baseline,
                          width=w, height=h, map_l=(m1l, m2l), map_r=(m1r, m2r))


_NUM_RE = re.compile(r"(\d+)")


def sorted_images(folder: str):
    """Numeric filename sort (dataset.cpp getSortedImages :51)."""
    names = [n for n in os.listdir(folder)
             if n.lower().endswith((".png", ".jpg", ".pgm", ".tiff"))]

    def key(n):
        m = _NUM_RE.search(n)
        return int(m.group(1)) if m else 0

    return [os.path.join(folder, n) for n in sorted(names, key=key)]


class StereoDirDataset:
    """Directory-based stereo sequence reader (Dataset, dataset.cpp:88-196):
    two image subfolders, regex-numeric filename sort, offset/count/step
    decimation, rectify-on-read.  Subfolder names follow the reference's
    ``images_subfolder_l/r`` dataset-params keys (cam0/data for EuRoC,
    image_2 / image_3 for KITTI, image_l / image_r for RGB-D rigs)."""

    def __init__(self, dataset_dir: str, calib: RectifiedCalib,
                 subfolder_l: str = "cam0/data", subfolder_r: str = "cam1/data",
                 offset: int = 0, nmax: int = 0, step: int = 1,
                 rectify_on_host: bool = True):
        self.files_l = sorted_images(os.path.join(dataset_dir, subfolder_l))
        self.files_r = sorted_images(os.path.join(dataset_dir, subfolder_r))
        n = min(len(self.files_l), len(self.files_r))
        end = offset + nmax * step if nmax > 0 else n
        self.files_l = self.files_l[offset:end:step]
        self.files_r = self.files_r[offset:end:step]
        self.calib = calib
        self.rectify_on_host = rectify_on_host
        # timestamps: ns when filenames carry EuRoC epoch values, else
        # frame index at 10 Hz (KITTI-style 000000.png counters)
        self.timestamps = []
        for i, p in enumerate(self.files_l):
            m = _NUM_RE.search(os.path.basename(p))
            v = int(m.group(1)) if m else i
            self.timestamps.append(v * 1e-9 if v > 10 ** 14 else 0.1 * i)

    def __len__(self):
        return len(self.files_l)

    def __getitem__(self, i: int):
        il = cv2.imread(self.files_l[i], cv2.IMREAD_GRAYSCALE)
        ir = cv2.imread(self.files_r[i], cv2.IMREAD_GRAYSCALE)
        if self.rectify_on_host and not self.calib.identity_maps:
            il = cv2.remap(il, *self.calib.map_l, cv2.INTER_LINEAR)
            ir = cv2.remap(ir, *self.calib.map_r, cv2.INTER_LINEAR)
        return (il.astype(np.float32), ir.astype(np.float32),
                self.timestamps[i])


class EurocDataset(StereoDirDataset):
    """EuRoC MAV layout: mav0/cam0/data + mav0/cam1/data (also accepts
    cam0/data at the top level)."""

    def __init__(self, dataset_dir: str, calib: RectifiedCalib,
                 offset: int = 0, nmax: int = 0, step: int = 1,
                 rectify_on_host: bool = True):
        for sub in ("mav0", "."):
            if os.path.isdir(os.path.join(dataset_dir, sub, "cam0", "data")):
                base = os.path.join(dataset_dir, sub)
                break
        else:
            raise FileNotFoundError(f"no cam0/data under {dataset_dir}")
        super().__init__(base, calib, "cam0/data", "cam1/data",
                         offset=offset, nmax=nmax, step=step,
                         rectify_on_host=rectify_on_host)


def load_groundtruth(gt_file: str):
    """Parse the reference's shipped ground truth
    (config/asl/gt-ass/*/groundtruth.txt: rows of 3x4 pose matrices) or the
    EuRoC csv (timestamp, p, q) — returns (timestamps?, positions (N,3))."""
    rows = []
    with open(gt_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in re.split(r"[,\s]+", line) if v]
            rows.append(vals)
    arr = np.asarray(rows)
    if arr.shape[1] == 12:          # 3x4 row-major pose per line
        pos = arr[:, [3, 7, 11]]
        return None, pos
    if arr.shape[1] >= 8:           # EuRoC state csv: t, px, py, pz, q...
        return arr[:, 0] * (1e-9 if arr[0, 0] > 1e14 else 1.0), arr[:, 1:4]
    raise ValueError(f"unrecognized ground-truth format: {arr.shape}")
