"""Map checkpoint / resume.

The reference cannot save or reload its map (SURVEY.md §5: "Checkpoint /
resume: None").  Here the whole array-ized map state — keyframe poses and
features, landmark tensors, observation tables, covisibility counts — is
serialized to one compressed npz, enabling restart, offline global BA, and
map merging.
"""

from __future__ import annotations

import numpy as np

from ..backend.mapping import KeyframeRecord, MapHandler

_KF_FIELDS = [
    "pt_uv", "pt_P", "pt_desc", "pt_sigma2", "pt_valid", "pt_lm",
    "ls_sp", "ls_ep", "ls_sP", "ls_eP", "ls_NDc", "ls_desc", "ls_sigma2",
    "ls_valid", "ls_lm",
]


def save_map(path: str, mapper: MapHandler) -> None:
    mp = mapper.map
    data = {
        "covis": mp.covis,
        "pt_w": mp.pt_w, "pt_desc": mp.pt_desc, "pt_valid": mp.pt_valid,
        "pt_first_kf": mp.pt_first_kf, "pt_last_kf": mp.pt_last_kf,
        "ls_w": mp.ls_w, "ls_epw": mp.ls_epw,
        "ls_desc": mp.ls_desc, "ls_valid": mp.ls_valid,
        "ls_first_kf": mp.ls_first_kf, "ls_last_kf": mp.ls_last_kf,
        "n_kf": np.asarray(len(mp.keyframes)),
    }
    # observation tables flattened to (lm, kf, feat) triples
    pt_obs = [(lm, kf, fi) for lm, obs in enumerate(mp.pt_obs)
              for kf, fi in obs]
    ls_obs = [(lm, kf, fi) for lm, obs in enumerate(mp.ls_obs)
              for kf, fi in obs]
    data["pt_obs"] = np.asarray(pt_obs, np.int64).reshape(-1, 3)
    data["ls_obs"] = np.asarray(ls_obs, np.int64).reshape(-1, 3)
    for i, kf in enumerate(mp.keyframes):
        data[f"kf{i}_pose"] = kf.T_w_k
        data[f"kf{i}_active"] = np.asarray(kf.active)
        for f in _KF_FIELDS:
            data[f"kf{i}_{f}"] = getattr(kf, f)
    np.savez_compressed(path, **data)


def load_map(path: str, mapper: MapHandler) -> MapHandler:
    """Restore map state in place (mapper supplies cam + configs)."""
    z = np.load(path, allow_pickle=False)
    mp = mapper.map
    mp.covis = z["covis"]
    mp.pt_w = z["pt_w"]
    mp.pt_desc = z["pt_desc"]
    mp.pt_valid = z["pt_valid"]
    mp.pt_first_kf = z["pt_first_kf"]
    mp.pt_last_kf = z["pt_last_kf"]
    mp.ls_w = z["ls_w"]
    mp.ls_epw = (z["ls_epw"] if "ls_epw" in z.files
                 else np.zeros((len(mp.ls_w), 2, 3)))
    mp.ls_desc = z["ls_desc"]
    mp.ls_valid = z["ls_valid"]
    mp.ls_first_kf = z["ls_first_kf"]
    mp.ls_last_kf = z["ls_last_kf"]
    mp.pt_obs = [[] for _ in range(len(mp.pt_valid))]
    for lm, kf, fi in z["pt_obs"]:
        mp.pt_obs[lm].append((int(kf), int(fi)))
    mp.ls_obs = [[] for _ in range(len(mp.ls_valid))]
    for lm, kf, fi in z["ls_obs"]:
        mp.ls_obs[lm].append((int(kf), int(fi)))
    mp.keyframes = []
    for i in range(int(z["n_kf"])):
        kf = KeyframeRecord.__new__(KeyframeRecord)
        kf.id = i
        kf.T_w_k = z[f"kf{i}_pose"]
        kf.active = bool(z[f"kf{i}_active"]) if f"kf{i}_active" in z else True
        for f in _KF_FIELDS:
            setattr(kf, f, z[f"kf{i}_{f}"])
        mp.keyframes.append(kf)
    return mapper
