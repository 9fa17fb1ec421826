"""Image/prompt datasets feeding the trainers with numpy batches.

Functional equivalents of the reference's datasets
(``data_generation/dataset.py``):

- ``BaseDataset``: {image_path: prompt} JSON -> (pixels in [-1,1], token ids).
  Reference resizes with LANCZOS to ``resolution`` (``finetune_sd.py:628-630``).
- ``TokenDataset``: additionally rewrites the prompt, inserting each new
  (learnable) token before its trigger word and recording the token start
  positions (``dataset.py:89-97``); pads the positions list to a fixed width
  so batches stack into static shapes for jit.

TPU-first loading: a thread-pool ``DataLoader`` decodes/resizes on the host
while the previous batch trains on device (double-buffered), batches are
dense numpy arrays in NHWC ready for ``device_put`` onto a sharded mesh.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def load_prompt_json(dataset_folder: str, json_file_name: str) -> List[Tuple[str, str]]:
    with open(os.path.join(dataset_folder, json_file_name)) as f:
        return list(json.load(f).items())


def load_image(path: str, resolution: int, method=Image.LANCZOS) -> np.ndarray:
    """RGB image -> f32 (H, W, 3) in [-1, 1]."""
    img = Image.open(path).convert("RGB").resize((resolution, resolution), method)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def probe_uniform_size(paths: Sequence[str]) -> Optional[Tuple[int, int]]:
    """(w, h) when every image shares one size, else None. PIL lazy opens
    read only the header (~0.1 ms/file), so probing a 10k-tile set is
    cheap and happens once at dataset construction."""
    size = None
    for p in paths:
        with Image.open(p) as im:
            s = im.size
        if size is None:
            size = s
        elif s != size:
            return None
    return size


def load_image_u8(path: str) -> np.ndarray:
    """RGB image -> uint8 (H, W, 3) at native size (no host resize: the
    device-resize path upscales on chip — data/device_resize.py)."""
    from agenda_tpu.data.native_image import load_rgb

    return load_rgb(path)


class BaseDataset:
    def __init__(self, dataset_folder: str, json_file_name: str, resolution: int,
                 tokenizer, device_resize: bool = False):
        self.dataset_folder = dataset_folder
        self.data = load_prompt_json(dataset_folder, json_file_name)
        self.resolution = resolution
        self.tokenizer = tokenizer
        self.source_size = None
        if device_resize and not os.environ.get("AGENDA_TPU_NO_DEVICE_RESIZE"):
            # uniform source size => ship uint8 tiles, resize on device
            # (data/device_resize.py); mixed sizes keep the host path
            self.source_size = probe_uniform_size(
                [os.path.join(dataset_folder, p) for p, _ in self.data])

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img_path, prompt = self.data[index]
        ids = self.tokenizer(prompt)
        if self.source_size is not None:
            u8 = load_image_u8(os.path.join(self.dataset_folder, img_path))
            return {"pixel_u8": u8, "input_ids": ids}
        pixels = load_image(os.path.join(self.dataset_folder, img_path), self.resolution)
        return {"pixel_values": pixels, "input_ids": ids}


class TokenDataset:
    def __init__(
        self,
        dataset_folder: str,
        json_file_name: str,
        resolution: int,
        tokenizer,
        word_tokens: Optional[Sequence[str]] = None,
        new_tokens: Optional[Sequence[str]] = None,
        resize_method=Image.BILINEAR,  # token finetuner uses bilinear (finetune_sd_token.py:816)
        device_resize: bool = False,
    ):
        self.dataset_folder = dataset_folder
        self.data = load_prompt_json(dataset_folder, json_file_name)
        self.resolution = resolution
        self.tokenizer = tokenizer
        self.word_tokens = list(word_tokens or [])
        self.new_tokens = list(new_tokens or [])
        self.resize_method = resize_method
        # Static width for the starts vector: one slot per trigger word; multi
        # token first-words can add more — use a safe fixed bound.
        self.starts_width = max(1, len(self.word_tokens))
        self.source_size = None
        if device_resize and not os.environ.get("AGENDA_TPU_NO_DEVICE_RESIZE"):
            self.source_size = probe_uniform_size(
                [os.path.join(dataset_folder, p) for p, _ in self.data])

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        from agenda_tpu.data.tokens import insert_new_tokens

        img_path, prompt = self.data[index]
        starts: List[int] = []
        if self.word_tokens and self.new_tokens:
            prompt, starts = insert_new_tokens(
                self.tokenizer, prompt, self.word_tokens, self.new_tokens
            )
        ids = self.tokenizer(prompt)
        starts = starts[: self.starts_width]
        starts = starts + [-1] * (self.starts_width - len(starts))
        out = {
            "input_ids": ids,
            "new_tokens_start": np.asarray(starts, dtype=np.int32),
        }
        if self.source_size is not None:
            out["pixel_u8"] = load_image_u8(
                os.path.join(self.dataset_folder, img_path))
        else:
            out["pixel_values"] = load_image(
                os.path.join(self.dataset_folder, img_path), self.resolution,
                self.resize_method)
        return out


def _stack(batch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([b[k] for b in batch]) for k in batch[0]}


class DataLoader:
    """Shuffled, epoch-seeded, prefetching batch iterator (drop_last=False).

    Replaces torch ``DataLoader(shuffle=True)`` (``finetune_sd.py:632-637``)
    with a deterministic numpy-RNG shuffle per epoch and a background thread
    pool that keeps ``prefetch`` batches decoded ahead of the device.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 2,
        prefetch: int = 2,
        drop_last: bool = False,
        pad_to_full: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        # pad_to_full cycles indices so every batch has exactly batch_size
        # rows — required for static shapes under jit on a sharded mesh.
        self.pad_to_full = pad_to_full
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches_indices(self) -> List[np.ndarray]:
        return self.batches_for_epoch(self.epoch)

    def batches_for_epoch(self, epoch: int) -> List[np.ndarray]:
        """Pure function of (seed, epoch) — lets plan prefetchers build
        FUTURE epochs' batches without touching iterator state."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        nb = len(self)
        out = [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        if self.pad_to_full:
            out = [
                b if len(b) == self.batch_size
                else np.concatenate([b, np.resize(idx, self.batch_size - len(b))])
                for b in out
            ]
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches_indices()
        self.epoch += 1
        if self.num_workers == 0:
            for b in batches:
                yield _stack([self.dataset[int(i)] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(_stack([self.dataset[int(i)] for i in b]))
                q.put(None)
            except BaseException as e:  # propagate to the consumer
                q.put(("__error__", e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
                    raise item[1]
                yield item
        finally:
            stop.set()
