"""Batch pipeline: host decode/augment pool -> padded device batches.

Replaces Dassl's multiprocess torch DataLoader (SURVEY.md §2.9) with a
thread-pool pipeline (PIL releases the GIL during decode/resize) plus a
one-batch prefetch queue so host preprocessing overlaps device compute.

Batches are dicts {"img": (B, H, W, 3) uint8, "label": (B,) int32,
"mask": (B,) float32} where B is ALWAYS the configured batch size: the
final partial batch is zero-padded and flagged via ``mask`` so every
train/eval step reuses ONE compiled XLA program (no recompile on the
remainder batch — the TPU answer to dynamic batch shapes).
"""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .datum import Datum


class BatchLoader:
    def __init__(
        self,
        items: Sequence[Datum],
        transform: Callable[[str, bool], np.ndarray],
        batch_size: int,
        train: bool,
        shuffle: bool,
        num_workers: int = 8,
        prefetch: int = 2,
        pad_to: Optional[int] = None,
        drop_last: bool = False,
    ):
        self.items = list(items)
        self.transform = transform
        self.batch_size = int(batch_size)
        self.pad_to = int(pad_to) if pad_to else self.batch_size
        assert self.pad_to >= self.batch_size
        # Dassl drops the final partial TRAIN batch (when the dataset has
        # at least one full batch) — same step count as the reference.
        self.drop_last = bool(drop_last) and len(self.items) >= self.batch_size
        self.train = train
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.pool = ThreadPoolExecutor(max_workers=self.num_workers)
        self.prefetch = prefetch

    def __len__(self) -> int:
        if self.drop_last:
            return len(self.items) // self.batch_size
        return (len(self.items) + self.batch_size - 1) // self.batch_size

    @property
    def num_items(self) -> int:
        return len(self.items)

    def _make_batch(
        self, batch_items: List[Datum], rng=None
    ) -> Dict[str, np.ndarray]:
        if self.train and getattr(self.transform, "device_resize", 0):
            return self._make_device_augment_batch(batch_items, rng=rng)
        imgs = self._native_eval_batch(batch_items)
        if imgs is None:
            # Augmentation randomness is drawn HERE, sequentially in item
            # order, from the PRIVATE per-epoch ``rng`` (seeded once from
            # the global stream on the consumer thread at __iter__ time) —
            # the pool only decodes/resizes, and NO producer-side code
            # ever touches the seeded global stream.  Eval batches draw
            # no plans (make_plan(train=False) is None by contract) and
            # never hit the native TRAIN kernel.
            has_plan = self.train and hasattr(self.transform, "make_plan")
            plans = [
                self.transform.make_plan(it.impath, True, rng=rng)
                if has_plan
                else None
                for it in batch_items
            ]
            imgs = (
                self._native_train_batch(batch_items, plans) if has_plan else None
            )
        else:
            plans, has_plan = None, False
        if imgs is None:

            def apply(item_plan):
                item, plan = item_plan
                if has_plan:
                    return self.transform(item.impath, self.train, plan=plan)
                return self.transform(item.impath, self.train)

            imgs = list(self.pool.map(apply, zip(batch_items, plans or [None] * len(batch_items))))
        B = self.pad_to
        n = len(batch_items)
        img0 = imgs[0]
        out_img = np.zeros((B,) + img0.shape, dtype=img0.dtype)
        out_lab = np.zeros((B,), dtype=np.int32)
        out_mask = np.zeros((B,), dtype=np.float32)
        for i, (im, it) in enumerate(zip(imgs, batch_items)):
            out_img[i] = im
            out_lab[i] = it.label
            out_mask[i] = 1.0
        return {"img": out_img, "label": out_lab, "mask": out_mask, "n": n}

    def _make_device_augment_batch(
        self, batch_items: List[Datum], rng=None
    ) -> Dict[str, np.ndarray]:
        """Device-augment train path (INPUT.DEVICE_RESIZE): raw (S, S, 3)
        uint8 sources + the host-sampled crop boxes/flips; the
        crop/resize/flip/normalize run inside the jitted train step
        (device_train_preprocess).  The batch carries 'box' (B, 4) int32
        [left, top, crop_w, crop_h] and 'flip' (B,) int32; rows without a
        crop plan (and padding rows) get the full frame."""
        tp = self.transform
        S = tp.device_resize
        # one header read per image: the size feeds both the RRC plan and
        # the exact-source check (make_plan would otherwise re-read it)
        sizes = [tp.image_size(it.impath) for it in batch_items]
        # randomness drawn sequentially from the per-epoch private rng,
        # exactly like the host path
        plans = [
            tp.make_plan(it.impath, True, size=sz, rng=rng)
            for it, sz in zip(batch_items, sizes)
        ]
        # RRC boxes are sampled in ORIGINAL coordinates (transforms.py
        # make_plan): exact-(S, S) sources pass the box to the device;
        # any other size gets the crop host-applied during decode so the
        # augmentation still covers the full frame
        exact = [sz == (S, S) for sz in sizes]
        imgs = None
        if all(exact):
            # decode-to-source via the C++ batch kernel when possible (at
            # size=S the eval kernel IS raw_source), else the PIL pool
            imgs = self._native_fixed_batch(batch_items, S)
        if imgs is None:
            host_boxes = [
                None if (ex or plan is None) else plan[0]
                for ex, plan in zip(exact, plans)
            ]
            imgs = list(
                self.pool.map(
                    lambda ib: tp.raw_source(ib[0].impath, box=ib[1]),
                    zip(batch_items, host_boxes),
                )
            )
        B = self.pad_to
        n = len(batch_items)
        out_img = np.zeros((B, S, S, 3), np.uint8)
        out_lab = np.zeros((B,), np.int32)
        out_mask = np.zeros((B,), np.float32)
        out_box = np.tile(np.asarray([0, 0, S, S], np.int32), (B, 1))
        out_flip = np.zeros((B,), np.int32)
        for i, (im, it, plan) in enumerate(zip(imgs, batch_items, plans)):
            out_img[i] = im
            out_lab[i] = it.label
            out_mask[i] = 1.0
            if plan is not None:
                box, flip = plan
                if box is not None and exact[i]:
                    out_box[i] = box  # non-exact: host-applied, full frame
                out_flip[i] = 1 if flip else 0
        return {
            "img": out_img, "label": out_lab, "mask": out_mask, "n": n,
            "box": out_box, "flip": out_flip,
        }

    def _native_train_batch(self, batch_items: List[Datum], plans):
        """Whole-batch decode + planned crop/resize/flip in the C++ thread
        pool (train path, all-JPEG batches): the randomness is already in
        ``plans`` (sampled sequentially), so the native code only executes
        — per-image Python dispatch and the GIL drop out of the hot loop."""
        if not self.train:
            return None
        tp = self.transform
        if not hasattr(tp, "size") or getattr(tp, "interpolation", "") != "bicubic":
            return None
        if not all(
            it.impath.lower().endswith((".jpg", ".jpeg")) for it in batch_items
        ):
            return None
        from rpo_tpu._native import get_lib

        lib = get_lib()
        if lib is None:
            return None
        import ctypes

        n = len(batch_items)
        size = tp.size
        boxes = np.full((n, 4), -1, np.int32)
        flips = np.zeros((n,), np.uint8)
        for i, plan in enumerate(plans):
            if plan is None:
                continue
            box, flip = plan
            flips[i] = 1 if flip else 0
            if box is not None:
                boxes[i] = box
        out = np.empty((n, size, size, 3), np.uint8)
        ok = np.zeros((n,), np.uint8)
        arr = (ctypes.c_char_p * n)(*[it.impath.encode() for it in batch_items])
        lib.rpo_train_preprocess_batch(
            arr, boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.num_workers,
        )
        imgs = []
        for i, it in enumerate(batch_items):
            if ok[i]:
                imgs.append(out[i])
            else:  # corrupt/non-JPEG content: PIL fallback per item
                imgs.append(self.transform(it.impath, True, plan=plans[i]))
        return imgs

    def _native_eval_batch(self, batch_items: List[Datum]):
        if self.train:
            return None
        tp = self.transform
        # device-resize mode ships raw source pixels: the SAME native
        # kernel serves it with size=S (resize-shorter-to-S + center-crop
        # S is identity for exact-size sources, and exactly raw_source's
        # host-normalization for odd ones)
        size = getattr(tp, "device_resize", 0) or getattr(tp, "size", 0)
        return self._native_fixed_batch(batch_items, size)

    def _native_fixed_batch(self, batch_items: List[Datum], size: int):
        """Whole-batch decode + resize-shorter + center-crop to ``size``
        in the C++ thread pool (all-JPEG batches): bypasses per-image
        Python dispatch and the GIL."""
        tp = self.transform
        if not size or getattr(tp, "interpolation", "") != "bicubic":
            return None
        if not all(
            it.impath.lower().endswith((".jpg", ".jpeg")) for it in batch_items
        ):
            return None
        from rpo_tpu._native import get_lib

        lib = get_lib()
        if lib is None:
            return None
        import ctypes

        n = len(batch_items)
        out = np.empty((n, size, size, 3), np.uint8)
        ok = np.zeros((n,), np.uint8)
        arr = (ctypes.c_char_p * n)(*[it.impath.encode() for it in batch_items])
        lib.rpo_eval_preprocess_batch(
            arr, n, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.num_workers,
        )
        imgs = []
        for i, it in enumerate(batch_items):
            if ok[i]:
                imgs.append(out[i])
            else:  # corrupt/non-JPEG content: per-item fallback at the
                # same target size (device-resize mode must NOT fall back
                # to the full-size transform — raw_source matches size)
                if getattr(tp, "device_resize", 0) == size:
                    imgs.append(tp.raw_source(it.impath))
                else:
                    imgs.append(self.transform(it.impath, False))
        return imgs

    def _order(self) -> List[int]:
        order = list(range(len(self.items)))
        if self.shuffle:
            random.shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # Thread hygiene: an abandoned epoch's producer may still be
        # inside an in-flight _make_batch (it only notices abandonment
        # between batches).  Joining it here bounds the loader to one
        # live producer thread + one prefetch queue, and lets a
        # still-active old consumer get a loud error instead of a silent
        # deadlock.  Determinism does NOT depend on this join: all seeded
        # global-`random` draws happen below on THIS (consumer) thread,
        # and the producer only ever draws from its private per-epoch
        # Random — an abandoned producer's remaining draws land in its
        # own dead stream (pinned by test_abandoned_producer_draws_zero_
        # global_randomness).
        prev = getattr(self, "_producer", None)
        if prev is not None and prev.is_alive():
            # mark the old epoch abandoned first: a consumer that merely
            # dropped its iterator (no close/GC yet) never set the event,
            # and joining an un-abandoned producer parked on a full queue
            # would deadlock
            self._producer_abandoned.set()
            prev.join()
            # if the old iterator is still being consumed (not just
            # dropped), its q.get() would now block forever — its producer
            # will never deliver the stop sentinel.  Flush the stale queue
            # and hand it an error instead of a silent deadlock.
            prev_q = self._q
            try:
                while True:
                    prev_q.get_nowait()
            except queue.Empty:
                pass
            prev_q.put_nowait(
                RuntimeError(
                    "a new iteration of this BatchLoader started while a "
                    "previous iterator was still active; concurrent "
                    "iterators over one loader are unsupported (the seeded "
                    "augmentation randomness is drawn sequentially)"
                )
            )
        order = self._order()
        # ALL seeded randomness for this epoch is fixed right here, on the
        # consumer thread: the shuffle above plus ONE seed draw.  The
        # producer receives a private Random and draws every per-image
        # plan from it sequentially in item order, so the global stream
        # advances by exactly (shuffle + 1) per epoch regardless of
        # producer/pool scheduling — seeded determinism by construction.
        epoch_rng = random.Random(random.getrandbits(64))
        chunks = [
            [self.items[j] for j in order[i : i + self.batch_size]]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and chunks and len(chunks[-1]) < self.batch_size:
            chunks.pop()
        if not chunks:
            return
        # maxsize=0 would mean UNBOUNDED (the whole epoch resident), not
        # "no prefetch" — clamp to the minimum real bound
        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = object()
        abandoned = threading.Event()

        def put(item) -> bool:
            """Bounded put that notices an abandoned consumer: a caller
            that drops the iterator mid-epoch (an exception in its step
            loop) must not park this thread on a full queue forever,
            leaking the thread and `prefetch` decoded batches."""
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for chunk in chunks:
                    if not put(self._make_batch(chunk, rng=epoch_rng)):
                        return
                put(stop)
            except BaseException as exc:  # propagate to the consumer —
                # swallowing it would silently truncate the epoch
                put(exc)

        t = threading.Thread(target=producer, daemon=True, name="batch-producer")
        self._producer = t
        self._producer_abandoned = abandoned
        self._q = q
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is stop:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            abandoned.set()  # generator closed (normally or not)
