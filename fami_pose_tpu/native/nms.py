"""ctypes bindings for the native NMS library (``native/nms.cpp``).

The C++ library replaces the reference's Cython/CUDA extension
(``thirdparty/nms/``); it is built on demand with ``make -C native`` (g++)
the first time a binding is used, and every function falls back to the pure
numpy implementations in ``fami_pose_tpu.ops.nms`` when the toolchain is
unavailable — the numpy versions double as the golden reference in tests.
"""

import ctypes
import logging
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = osp.abspath(osp.join(osp.dirname(__file__), "..", ".."))
_NATIVE_DIR = osp.join(_REPO_ROOT, "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libfami_nms.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not osp.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception as e:  # no toolchain -> numpy fallback
                logging.getLogger(__name__).warning(
                    f"native nms build failed ({e}); using numpy fallback"
                )
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.fami_cpu_nms.restype = ctypes.c_int
        lib.fami_cpu_nms.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_float, i32p,
        ]
        lib.fami_oks_nms.restype = ctypes.c_int
        lib.fami_oks_nms.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            f32p, ctypes.c_float, i32p,
        ]
        lib.fami_soft_oks_nms.restype = ctypes.c_int
        lib.fami_soft_oks_nms.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            f32p, ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            i32p, f32p,
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def cpu_nms(dets: np.ndarray, thresh: float) -> list:
    """Greedy box NMS; ``dets`` is (N, 5) [x1, y1, x2, y2, score]."""
    dets = np.ascontiguousarray(dets, np.float32)
    n = len(dets)
    if n == 0:
        return []
    lib = _load()
    if lib is None:
        from fami_pose_tpu.ops.nms import nms as np_nms

        return list(np_nms(dets, thresh))
    boxes = np.ascontiguousarray(dets[:, :4], np.float32)
    scores = np.ascontiguousarray(dets[:, 4], np.float32)
    keep = np.zeros(n, np.int32)
    cnt = lib.fami_cpu_nms(boxes, scores, n, float(thresh), keep)
    return keep[:cnt].tolist()


def _default_sigmas(nj: int) -> np.ndarray:
    from fami_pose_tpu.data.keypoints import COCO_OKS_SIGMAS

    if nj == len(COCO_OKS_SIGMAS):
        return np.asarray(COCO_OKS_SIGMAS, np.float32)
    return np.full(nj, 0.05, np.float32)


def oks_nms_native(kpts_db, thresh, sigmas=None, in_vis_thre=None) -> list:
    """Greedy OKS NMS over a list of dicts with 'keypoints' (J, 3), 'score',
    'area' (reference ``nms.py:59-92`` contract)."""
    n = len(kpts_db)
    if n == 0:
        return []
    lib = _load()
    if lib is None:
        from fami_pose_tpu.ops.nms import oks_nms as np_oks

        return list(np_oks(kpts_db, thresh, sigmas, in_vis_thre))
    nj = np.asarray(kpts_db[0]["keypoints"]).shape[0]
    kpts = np.ascontiguousarray(
        np.stack([np.asarray(d["keypoints"], np.float32) for d in kpts_db])
    )
    scores = np.ascontiguousarray(
        [float(d["score"]) for d in kpts_db], np.float32
    )
    areas = np.ascontiguousarray([float(d["area"]) for d in kpts_db], np.float32)
    sig = np.ascontiguousarray(
        sigmas if sigmas is not None else _default_sigmas(nj), np.float32
    )
    keep = np.zeros(n, np.int32)
    cnt = lib.fami_oks_nms(
        kpts, scores, areas, n, nj, float(thresh), sig,
        float(in_vis_thre or 0.0), keep,
    )
    return keep[:cnt].tolist()


def soft_oks_nms_native(
    kpts_db, thresh, sigmas=None, in_vis_thre=None, method: int = 2,
    soft_sigma: float = 0.5, max_dets: int = 20,
):
    """Soft OKS NMS; returns (keep_indices, rescored_scores)."""
    n = len(kpts_db)
    if n == 0:
        return [], []
    lib = _load()
    if lib is None:
        from fami_pose_tpu.ops.nms import soft_oks_nms as np_soft

        keep = list(np_soft(kpts_db, thresh, max_dets=max_dets, sigmas=sigmas,
                            vis_thr=in_vis_thre))
        return keep, []
    nj = np.asarray(kpts_db[0]["keypoints"]).shape[0]
    kpts = np.ascontiguousarray(
        np.stack([np.asarray(d["keypoints"], np.float32) for d in kpts_db])
    )
    scores = np.ascontiguousarray(
        [float(d["score"]) for d in kpts_db], np.float32
    )
    areas = np.ascontiguousarray([float(d["area"]) for d in kpts_db], np.float32)
    sig = np.ascontiguousarray(
        sigmas if sigmas is not None else _default_sigmas(nj), np.float32
    )
    keep = np.zeros(n, np.int32)
    out_scores = np.zeros(n, np.float32)
    cnt = lib.fami_soft_oks_nms(
        kpts, scores, areas, n, nj, float(thresh), sig,
        float(in_vis_thre or 0.0), int(method), float(soft_sigma),
        int(max_dets), keep, out_scores,
    )
    return keep[:cnt].tolist(), out_scores[:cnt].tolist()
