"""Video frame ingestion for the SAM2 video predictor.

Behavioural parity: `sam2/utils/misc.py:98-305` — JPEG-folder and MP4
video loading with an optional asynchronous decode thread
(`AsyncVideoFrameLoader`, `misc.py:98-165`).

TPU design: frames decode on the host (cv2), are resized+normalized by
``SAM2Transforms``, and are uploaded to the device in fixed-shape CHUNKS as
the decode thread fills the buffer — per-frame host->device transfers
would serialize the streaming loop on a remote device, and a single
whole-video upload would block session start (what the async loader is
for).  ``get(idx)`` blocks only until frame ``idx``'s chunk is decoded.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_JPEG_EXTS = (".jpg", ".jpeg", ".JPG", ".JPEG")


def list_jpeg_frames(folder: str) -> List[str]:
    """`<frame_index>.jpg` listing (`misc.py:237-245`): numeric sort when
    all stems are ints, lexical otherwise."""
    names = [n for n in os.listdir(folder) if n.endswith(_JPEG_EXTS)]
    if not names:
        raise RuntimeError(f"no images found in {folder}")
    try:
        names.sort(key=lambda p: int(os.path.splitext(p)[0]))
    except ValueError:
        names.sort()
    return [os.path.join(folder, n) for n in names]


def _decode_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise RuntimeError(f"failed to decode {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def decode_video_frames(path: str) -> List[np.ndarray]:
    """MP4 decode via cv2 (`misc.py:274-305` uses decord; same contract:
    RGB HWC uint8 frames)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"failed to open video {path}")
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames decoded from {path}")
    return frames


class ArrayFrameSource:
    """Pre-decoded frames: one whole-stack device upload (the fast path
    for benches; ~78 MB for 25 frames at 512px)."""

    def __init__(self, frames: Sequence[np.ndarray], transforms):
        self.orig_hw: Tuple[int, int] = np.asarray(frames[0]).shape[:2]
        self.num_frames = len(frames)
        self._stack = jax.device_put(
            jnp.asarray(transforms.forward_batch(list(frames)))
        )

    def get(self, idx: int) -> jax.Array:
        return self._stack[idx]


class AsyncJpegFrameSource:
    """Background-decode frame source (`AsyncVideoFrameLoader` parity).

    A daemon thread decodes + preprocesses frames in order; finished frames
    are uploaded to the device in fixed-size chunks.  ``get`` blocks until
    the owning chunk is ready; exceptions in the thread re-raise on the
    caller (`misc.py:139-152`).
    """

    def __init__(self, img_paths: List[str], transforms, chunk: int = 16):
        self.paths = img_paths
        self.num_frames = len(img_paths)
        self._transforms = transforms
        self._chunk = chunk
        n_chunks = -(-self.num_frames // chunk)
        self._host: List[Optional[np.ndarray]] = [None] * n_chunks
        self._device: List[Optional[jax.Array]] = [None] * n_chunks
        self._ready = [threading.Event() for _ in range(n_chunks)]
        self._exception: Optional[BaseException] = None

        # decode the first frame synchronously: orig_hw is needed now and
        # frame 0 is where the user clicks first (`misc.py:125-128`)
        first = _decode_image(img_paths[0])
        self.orig_hw = first.shape[:2]
        self._first = first

        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            buf = []
            ci = 0
            for i, p in enumerate(self.paths):
                img = self._first if i == 0 else _decode_image(p)
                buf.append(img)
                if len(buf) == self._chunk or i == self.num_frames - 1:
                    self._host[ci] = self._transforms.forward_batch(buf)
                    self._ready[ci].set()
                    buf = []
                    ci += 1
            self._first = None
        except BaseException as e:  # re-raised on the consumer side
            self._exception = e
            for ev in self._ready:
                ev.set()

    def get(self, idx: int) -> jax.Array:
        ci = idx // self._chunk
        self._ready[ci].wait()
        if self._exception is not None:
            raise RuntimeError(
                "Failure in frame loading thread"
            ) from self._exception
        if self._device[ci] is None:
            self._device[ci] = jax.device_put(jnp.asarray(self._host[ci]))
            self._host[ci] = None
        return self._device[ci][idx - ci * self._chunk]


def load_frame_source(
    video, transforms, async_loading_frames: bool = False, chunk: int = 16
):
    """`load_video_frames` dispatch (`misc.py:166-204`): ndarray sequence,
    JPEG folder, or MP4 file -> a frame source with
    (num_frames, orig_hw, get(idx))."""
    if isinstance(video, str):
        ext = os.path.splitext(video)[-1]
        if os.path.isdir(video):
            paths = list_jpeg_frames(video)
            if async_loading_frames:
                return AsyncJpegFrameSource(paths, transforms, chunk=chunk)
            return ArrayFrameSource(
                [_decode_image(p) for p in paths], transforms
            )
        if ext in (".mp4", ".MP4"):
            return ArrayFrameSource(decode_video_frames(video), transforms)
        raise NotImplementedError(
            "Only MP4 video and JPEG folder are supported at this moment"
        )
    return ArrayFrameSource(video, transforms)
