"""Training dataset + bucketed batching, TPU-shaped.

Counterpart of the reference pipeline (data/dataset.py:48-242): an
HDF5-backed dataset of precomputed EnCodec codes + transcripts, a
length-bucketed dynamic batch sampler capped by a token budget, and a
collate that pads to fixed shapes.

TPU-specific differences (deliberate redesign, not translation):
- the collate pads every batch up to a STATIC (text, audio) bucket pair so
  XLA compiles one program per bucket instead of one per max-length
  (reference pads to the batch max, which on TPU would recompile endlessly);
- audio pad value is 0 with an explicit length array (the reference's -1
  padding plus masking both work; masks are already how the losses consume
  lengths here);
- sharding for data parallelism is a plain `shard` slice per JAX process
  (jax.process_index) instead of a torch DistributedSampler.

HDF5 layout (reference-compatible): one group per utterance id holding
"audio" → int codes [8, T]; the annotation file maps
`utt_id|duration|language|text` per line.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import lang2code, lang2token
from ..frontend import PhonemeTokenizer


@dataclass
class Utterance:
    utt_id: str
    duration: float
    language: str
    text: str


class AudioDataset:
    """HDF5 EnCodec-code dataset (reference: data/dataset.py:131-184)."""

    def __init__(
        self,
        h5_path: str,
        ann_path: str,
        tokenizer: Optional[PhonemeTokenizer] = None,
    ):
        import h5py

        self.h5 = h5py.File(h5_path, "r")
        self.tokenizer = tokenizer or PhonemeTokenizer()
        self.utts: List[Utterance] = []
        with open(ann_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                utt_id, dur, lang, text = line.split("|", 3)
                self.utts.append(
                    Utterance(utt_id, float(dur), lang, text)
                )

    def __len__(self) -> int:
        return len(self.utts)

    def get_dur(self, idx: int) -> float:
        return self.utts[idx].duration

    def __getitem__(self, idx: int) -> Dict:
        u = self.utts[idx]
        codes = np.asarray(self.h5[u.utt_id]["audio"], np.int64)  # [8, T]
        token = lang2token.get(u.language, "[EN]")
        phone_ids, _ = self.tokenizer.tokenize(f"_{token}{u.text}{token}")
        return {
            "utt_id": u.utt_id,
            "text": u.text,
            "language": lang2code.get(u.language, 2),
            "text_tokens": np.asarray(phone_ids, np.int64),
            "audio_features": codes,  # [8, T]
            "audio_features_lens": codes.shape[1],
            "text_tokens_lens": len(phone_ids),
        }


class DynamicBatchSampler:
    """Length-bucketed dynamic batching under a token budget
    (reference: data/dataset.py:48-128)."""

    def __init__(
        self,
        indices_or_sampler,
        num_tokens_fn,
        num_buckets: int = 100,
        min_size: int = 0,
        max_size: int = 1000,
        max_tokens: Optional[int] = None,
        max_sentences: Optional[int] = None,
        drop_last: bool = False,
        shuffle: bool = True,
        seed: int = 0,
        shard: Tuple[int, int] = (0, 1),  # (process_index, process_count)
    ):
        assert max_tokens is not None or max_sentences is not None
        if max_tokens is not None:
            assert max_size <= max_tokens
        self.indices = list(indices_or_sampler)
        self.num_tokens_fn = num_tokens_fn
        self.num_buckets = num_buckets
        self.min_size = min_size
        self.max_size = max_size
        self.max_tokens = max_tokens if max_tokens is not None else math.inf
        self.max_sentences = (
            max_sentences if max_sentences is not None else math.inf
        )
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.shard = shard

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _is_full(self, num_tokens: float, batch: List[int]) -> bool:
        if not batch:
            return False
        return len(batch) == self.max_sentences or num_tokens > self.max_tokens

    def __iter__(self) -> Iterator[List[int]]:
        order = list(self.indices)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        rank, world = self.shard
        order = order[rank::world]

        buckets: List[List[int]] = [[] for _ in range(self.num_buckets)]
        bucket_len = [0.0] * self.num_buckets
        for idx in order:
            n = self.num_tokens_fn(idx)
            if not (self.min_size <= n <= self.max_size):
                continue
            b = math.floor(
                (n - self.min_size)
                / (self.max_size - self.min_size + 1)
                * self.num_buckets
            )
            bucket_len[b] = max(bucket_len[b], n)
            total = (len(buckets[b]) + 1) * bucket_len[b]
            if self._is_full(total, buckets[b]):
                yield buckets[b]
                buckets[b] = []
                bucket_len[b] = 0.0
            buckets[b].append(idx)

        leftover = [i for b in buckets for i in b]
        batch: List[int] = []
        blen = 0.0
        for idx in leftover:
            blen = max(blen, self.num_tokens_fn(idx))
            if self._is_full((len(batch) + 1) * blen, batch):
                yield batch
                batch = []
                blen = self.num_tokens_fn(idx)
            batch.append(idx)
        if batch and not self.drop_last:
            yield batch


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def collate(
    samples: List[Dict],
    text_buckets: Sequence[int] = (64, 128, 256),
    audio_buckets: Sequence[int] = (256, 512, 1024, 2048),
) -> Dict[str, np.ndarray]:
    """Pad a batch to static bucket shapes → arrays ready for train_step."""
    B = len(samples)
    S = _bucket(max(s["text_tokens_lens"] for s in samples), text_buckets)
    T = _bucket(max(s["audio_features_lens"] for s in samples), audio_buckets)

    text_ids = np.full((B, S), 3, np.int32)  # [PAD] id 3 (reference collate)
    lang_ids = np.zeros((B, S), np.int32)
    text_lens = np.zeros((B,), np.int32)
    codes = np.zeros((B, T, 8), np.int32)
    audio_lens = np.zeros((B,), np.int32)
    for i, s in enumerate(samples):
        sl = min(s["text_tokens_lens"], S)
        al = min(s["audio_features_lens"], T)
        text_ids[i, :sl] = s["text_tokens"][:sl]
        lang_ids[i, :] = s["language"]
        text_lens[i] = sl
        codes[i, :al] = s["audio_features"][:, :al].T
        audio_lens[i] = al
    return {
        "utt_ids": [s["utt_id"] for s in samples],
        "text_ids": text_ids,
        "lang_ids": lang_ids,
        "text_lens": text_lens,
        "codes": codes,
        "audio_lens": audio_lens,
    }


def create_dataloader(
    h5_path: str,
    ann_path: str,
    *,
    max_duration: float = 120.0,
    max_size: float = 20.0,
    num_buckets: int = 10,
    shuffle: bool = True,
    seed: int = 0,
    shard: Tuple[int, int] = (0, 1),
) -> Iterator[Dict[str, np.ndarray]]:
    """Generator of collated batches (reference: data/dataset.py:225-242)."""
    ds = AudioDataset(h5_path, ann_path)
    sampler = DynamicBatchSampler(
        range(len(ds)), ds.get_dur,
        num_buckets=num_buckets, max_size=max_size,
        max_tokens=max_duration, shuffle=shuffle, seed=seed, shard=shard,
    )
    for batch_idx in sampler:
        yield collate([ds[i] for i in batch_idx])
