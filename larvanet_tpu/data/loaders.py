"""Dataloader plugins, flag- and API-compatible with the reference.

Implements the reference's BaseLoader contract (reference
dataloaders/base.py:9-111): parse_args, prepare(scales), get_num_images,
get_patch_batch, get_random_image_patch_pair, get_image_patch_pair,
get_image_pair, and for threaded loaders the queue-runner trio
(start_training_queue_runner / stop_queue_runners / get_queue_data).

Registered names mirror the reference module files:
  div2k_train_loader        (dataloaders/div2k_train_loader.py)
  div2k_val_loader          (dataloaders/div2k_val_loader.py)
  div2k_train_loader_queue  (dataloaders/div2k_train_loader_queue.py)
  combined_loader           (dataloaders/combined_loader.py)
  div2k_train_loader_tensor (dataloaders/div2k_train_loader_tensor.py)
  basic_loader              (dataloaders/basic_loader.py)

TPU redesign of the threaded loaders: the reference runs 8 daemon
threads per scale pushing batches into queue.Queue(16), swallowing
producer exceptions (div2k_train_loader_queue.py:162-163, a documented
hazard). Here the queue runners are a supervised prefetch pool that
(a) assembles device-ready NHWC float32 batches, (b) re-raises producer
exceptions on the consumer thread, and (c) shuts down deterministically
with sentinels instead of polling a shared boolean.
"""

from __future__ import annotations

import argparse
import queue
import threading
from typing import Dict, List, Optional

import numpy as np

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_loader
from larvanet_tpu.data.dataset import PairDataset


class BaseLoader:
    """Reference BaseLoader contract (dataloaders/base.py)."""

    is_threaded = False

    def parse_args(self, args):
        raise NotImplementedError

    def prepare(self, scales):
        raise NotImplementedError

    def get_num_images(self):
        raise NotImplementedError

    def get_patch_batch(self, batch_size, scale, input_patch_size):
        raise NotImplementedError

    def get_random_image_patch_pair(self, scale, input_patch_size):
        raise NotImplementedError

    def get_image_patch_pair(self, image_index, scale, input_patch_size):
        raise NotImplementedError

    def get_image_pair(self, image_index, scale):
        raise NotImplementedError

    def reseed_for_step(self, step: int) -> None:
        """Re-key the sampling RNG to (data_seed, step) so a resumed run
        draws the SAME batch stream an uninterrupted run would — exact
        train-resume reproducibility (no reference analog: its loaders
        consume the global numpy RNG, base contract dataloaders/base.py).
        No-op when unseeded or when prefetch threads own the stream."""

    def start_training_queue_runner(self, batch_size, input_patch_size):
        raise NotImplementedError

    def stop_queue_runners(self):
        raise NotImplementedError

    def get_queue_data(self, scale):
        raise NotImplementedError


def _chw(img_hwc_u8: np.ndarray) -> np.ndarray:
    return img_hwc_u8.transpose(2, 0, 1).astype(np.float32)


class PairLoader(BaseLoader):
    """Shared implementation over PairDataset."""

    default_input_path = "data/DIV2K_train_LR_bicubic"
    default_truth_path = "data/DIV2K_train_HR"
    scheme = "div2k"
    always_cached = False

    def __init__(self):
        self.args = None
        self.dataset: Optional[PairDataset] = None

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--data_input_path", type=str, default=self.default_input_path,
                            help="Base path of the input images.")
        parser.add_argument("--data_truth_path", type=str, default=self.default_truth_path,
                            help="Base path of the ground-truth images.")
        parser.add_argument("--data_cached", action="store_true",
                            help="If true, cache the data on the memory.")
        parser.add_argument("--data_seed", type=int, default=None,
                            help="Seed for the patch-sampling RNG (new; reference used the global numpy RNG).")
        parser.add_argument("--data_native", type=int, default=1,
                            help="Use the native C++ decode/batch path when built (native/build.sh); 0 disables.")
        self._add_extra_args(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def _add_extra_args(self, parser):
        pass

    def prepare(self, scales):
        self.dataset = PairDataset(
            input_path=self.args.data_input_path,
            truth_path=self.args.data_truth_path,
            scheme=self.scheme,
            cached=self.args.data_cached or self.always_cached,
            seed=self.args.data_seed,
            use_native=bool(self.args.data_native),
        )
        self.dataset.prepare(scales)

    def get_num_images(self):
        return len(self.dataset)

    def get_patch_batch(self, batch_size, scale, input_patch_size):
        input_list, truth_list = [], []
        for _ in range(batch_size):
            ip, tp = self.get_random_image_patch_pair(scale, input_patch_size)
            input_list.append(ip)
            truth_list.append(tp)
        return input_list, truth_list

    def get_patch_batch_nhwc(self, batch_size, scale, input_patch_size):
        """Device-ready NHWC float32 batch (TPU fast path)."""
        return self.dataset.patch_batch_nhwc(batch_size, scale, input_patch_size)

    def reseed_for_step(self, step: int) -> None:
        if self.is_threaded or self.args.data_seed is None or self.dataset is None:
            return  # prefetch workers own their streams; unseeded = entropy
        self.dataset.reseed_for_step(step)

    def get_random_image_patch_pair(self, scale, input_patch_size):
        ip, tp = self.dataset.random_patch_pair_u8(scale, input_patch_size)
        return _chw(ip), _chw(tp)

    def get_image_patch_pair(self, image_index, scale, input_patch_size):
        ip, tp = self.dataset.random_patch_pair_u8(scale, input_patch_size, index=image_index)
        return _chw(ip), _chw(tp)

    def get_image_pair(self, image_index, scale):
        return self.dataset.image_pair_chw(image_index, scale)


class _QueueRunnerMixin:
    """Supervised prefetch pool replacing the reference's raw threads."""

    is_threaded = True
    queue_capacity = 16  # reference div2k_train_loader_queue.py:52
    default_num_runners = 8

    def _add_extra_args(self, parser):
        parser.add_argument("--data_num_queue_runners", type=int,
                            default=self.default_num_runners,
                            help="The number of threads for each queue runner.")

    def start_training_queue_runner(self, batch_size, input_patch_size):
        self._queues: Dict[int, queue.Queue] = {}
        self._stop_event = threading.Event()
        self._threads: List[threading.Thread] = []
        for scale in self.dataset.scale_list:
            self._queues[scale] = queue.Queue(maxsize=self.queue_capacity)
            for i in range(self.args.data_num_queue_runners):
                t = threading.Thread(
                    target=self._runner,
                    args=(scale, batch_size, input_patch_size, i),
                    daemon=True,
                    name="queue-runner-x%d-%d" % (scale, i),
                )
                t.start()
                self._threads.append(t)

    def _runner(self, scale, batch_size, input_patch_size, worker_id):
        # Per-thread RNG stream: deterministic under --data_seed but
        # uncorrelated across workers.
        local = PairDataset(
            input_path=self.dataset.input_path,
            truth_path=self.dataset.truth_path,
            scheme=self.dataset.scheme,
            cached=False,
            seed=None if self.args.data_seed is None else self.args.data_seed + worker_id,
        )
        # Share the (thread-safe, lock-guarded) cache with the main dataset.
        local.image_names = self.dataset.image_names
        local.scale_list = self.dataset.scale_list
        local.cached = self.dataset.cached
        local._input_cache = self.dataset._input_cache
        local._truth_cache = self.dataset._truth_cache
        local._cache_lock = self.dataset._cache_lock
        q = self._queues[scale]
        while not self._stop_event.is_set():
            try:
                batch = local.patch_batch_nhwc(batch_size, scale, input_patch_size)
            except Exception as exc:  # propagate to consumer, don't swallow
                try:
                    q.put(("error", exc), timeout=1.0)
                except queue.Full:
                    pass
                return
            while not self._stop_event.is_set():
                try:
                    q.put(("batch", batch), timeout=0.25)
                    break
                except queue.Full:
                    continue

    def stop_queue_runners(self):
        self._stop_event.set()
        # Drain so producers blocked on put() can observe the event.
        for q in self._queues.values():
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        for t in self._threads:
            t.join(timeout=5.0)
        self._threads = []

    def get_queue_data(self, scale):
        """Blocking batch fetch; returns (inputs, truths) as NHWC float32.

        Consumers that need the reference's list-of-CHW contract can index
        the arrays; the training loops in this framework feed NHWC batches
        straight to the jitted step.
        """
        kind, payload = self._queues[scale].get()
        if kind == "error":
            raise payload
        return payload


@register_loader("div2k_train_loader")
class DIV2KTrainLoader(PairLoader):
    pass


@register_loader("div2k_val_loader")
class DIV2KValLoader(PairLoader):
    """Validation loader; caching always on (reference div2k_val_loader.py)."""

    default_input_path = "data/DIV2K_valid_LR_bicubic"
    default_truth_path = "data/DIV2K_valid_HR"
    always_cached = True


@register_loader("div2k_train_loader_queue")
class DIV2KTrainLoaderQueue(_QueueRunnerMixin, PairLoader):
    pass


@register_loader("combined_loader")
class CombinedLoader(_QueueRunnerMixin, PairLoader):
    """Merged DIV2K+Flickr2K-style dataset, 6 runners
    (reference combined_loader.py:31-36)."""

    default_input_path = "data/Combined_LR"
    default_truth_path = "data/Combined_HR"
    default_num_runners = 6


@register_loader("basic_loader")
class BasicLoader(PairLoader):
    """Flat-dir single-scale loader (reference basic_loader.py:109-142)."""

    scheme = "flat"
    default_input_path = "data/LR"
    default_truth_path = "data/HR"


@register_loader("div2k_train_loader_tensor")
class DIV2KTrainLoaderTensor(PairLoader):
    """Eager full-dataset preload returning stacked arrays
    (reference div2k_train_loader_tensor.py:42-68). In the TPU framework
    the 'tensor' distinction collapses: prepare() pre-decodes everything
    into the uint8 cache and get_patch_batch returns stacked NHWC float32.
    """

    always_cached = True

    def parse_args(self, args):
        ns, remaining = super().parse_args(args)
        # the reference's tensor loader uniquely names its paths
        # --train_input_path/--train_truth_path (div2k_train_loader_
        # tensor.py:24-27); accept them as aliases so a migrated
        # train_schedule_tensor command line works verbatim
        alias = argparse.ArgumentParser()
        alias.add_argument("--train_input_path", type=str, default=None)
        alias.add_argument("--train_truth_path", type=str, default=None)
        extra, remaining = parse_known(alias, remaining)
        if extra.train_input_path:
            ns.data_input_path = extra.train_input_path
        if extra.train_truth_path:
            ns.data_truth_path = extra.train_truth_path
        return ns, remaining

    def prepare(self, scales):
        super().prepare(scales)
        for s in self.dataset.scale_list:
            for i in range(len(self.dataset)):
                self.dataset.input_u8(s, i)
                self.dataset.truth_u8(i)

    def get_patch_batch(self, batch_size, scale, input_patch_size):
        return self.dataset.patch_batch_nhwc(batch_size, scale, input_patch_size)
