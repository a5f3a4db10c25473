"""Generate a miniature EuRoC-format dataset on disk (VERDICT r4 missing #1).

Renders a synthetic stereo scene into the REAL on-disk formats the
reference consumes (src2/dataset.cpp:88-196; config/asl/gt-ass layout):

  out/mav0/cam0/data/<ns>.png      left frames, nanosecond filenames
  out/mav0/cam1/data/<ns>.png      right frames
  out/mav0/cam0/data.csv           "#timestamp [ns],filename" rows
  out/params.yaml                  dataset_params (scalar rectified form)
  out/groundtruth.csv              EuRoC-style "ns, px py pz, qw qx qy qz"
  out/gt-ass/groundtruth.txt       the reference's 3x4-row pose format
  out/gt-ass/associations.txt      nanosecond timestamps per GT row
  out/groundtruth_tum.txt          TUM t x y z qx qy qz qw (for evaluate_ate)

This is the CI fixture for the FULL disk path (dataset reader -> native
PNG loader -> rectify -> pipeline -> TUM dump -> ATE); real EuRoC data
drops into the identical pipeline via scripts/run_baseline_suite.py.

Usage: python scripts/make_mini_euroc.py OUT_DIR [--frames N]
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

# EXACTLY SyntheticScene's default camera: compiled-program cache keys
# include these values as constants, so matching them lets the CI
# subprocess reuse the pipeline binaries the in-process tests compiled
W, H = 376, 240
FX = FY = 217.6
CX, CY = 183.7, 126.1
BL = 0.110074
T0_NS = 1403636580913555456          # arbitrary EuRoC-era epoch
DT_NS = 50_000_000                   # 20 Hz


def rot_to_quat(R):
    """(w, x, y, z) from a rotation matrix."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def make(out_dir: str, frames: int = 8, seed: int = 0) -> dict:
    import cv2

    from plslam_tpu.io.synthetic import SyntheticScene, circular_trajectory

    scene = SyntheticScene(n_points=400, n_lines=48, seed=seed,
                           width=W, height=H, fx=FX, fy=FY, cx=CX, cy=CY,
                           baseline=BL)
    poses = circular_trajectory(frames, step_t=0.05)

    d0 = os.path.join(out_dir, "mav0", "cam0", "data")
    d1 = os.path.join(out_dir, "mav0", "cam1", "data")
    ga = os.path.join(out_dir, "gt-ass")
    for d in (d0, d1, ga):
        os.makedirs(d, exist_ok=True)

    csv_rows = ["#timestamp [ns],filename"]
    gt_csv = ["#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
              "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []"]
    gt_ass_rows, assoc_rows, tum_rows = [], [], []
    for i, T in enumerate(poses):
        ns = T0_NS + i * DT_NS
        il, ir = scene.render_stereo(T, noise=1.0)
        cv2.imwrite(os.path.join(d0, f"{ns}.png"),
                    np.asarray(il, np.uint8))
        cv2.imwrite(os.path.join(d1, f"{ns}.png"),
                    np.asarray(ir, np.uint8))
        csv_rows.append(f"{ns},{ns}.png")
        q = rot_to_quat(T[:3, :3])
        p = T[:3, 3]
        gt_csv.append(f"{ns},{p[0]},{p[1]},{p[2]},{q[0]},{q[1]},{q[2]},{q[3]}")
        gt_ass_rows.append(" ".join(f"{v:.9f}" for v in T[:3].reshape(-1)))
        assoc_rows.append(str(ns))
        tum_rows.append(f"{ns * 1e-9:.9f} {p[0]} {p[1]} {p[2]} "
                        f"{q[1]} {q[2]} {q[3]} {q[0]}")

    with open(os.path.join(out_dir, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("\n".join(csv_rows) + "\n")
    with open(os.path.join(out_dir, "groundtruth.csv"), "w") as f:
        f.write("\n".join(gt_csv) + "\n")
    with open(os.path.join(ga, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_ass_rows) + "\n")
    with open(os.path.join(ga, "associations.txt"), "w") as f:
        f.write("\n".join(assoc_rows) + "\n")
    with open(os.path.join(out_dir, "groundtruth_tum.txt"), "w") as f:
        f.write("\n".join(tum_rows) + "\n")
    params = os.path.join(out_dir, "params.yaml")
    with open(params, "w") as f:
        f.write(f"""cam0:
  cam_model: Pinhole
  cam_fx: {FX}
  cam_fy: {FY}
  cam_cx: {CX}
  cam_cy: {CY}
  cam_bl: {BL}
  cam_width: {W}
  cam_height: {H}
  cam_d0: 0.0
  cam_d1: 0.0
  cam_d2: 0.0
  cam_d3: 0.0
""")
    return {"dir": out_dir, "params": params, "frames": frames,
            "gt_csv": os.path.join(out_dir, "groundtruth.csv"),
            "gt_ass": os.path.join(ga, "groundtruth.txt"),
            "gt_tum": os.path.join(out_dir, "groundtruth_tum.txt"),
            "poses": poses}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    info = make(args.out_dir, args.frames)
    print(f"wrote {info['frames']}-frame mini EuRoC dataset to {info['dir']}")
