"""RUSLAN corpus dataset: metadata, feature extraction, two-tier feature cache.

Parity with reference data/dataset.py ``RuslanDataset``:

* pipe-separated ``metadata_RUSLAN_22200.csv`` or directory-scan fallback
  (:285-340), per-sample length precomputation with a pickled audio-metadata
  cache (:217-272), length-sorted samples (:400),
* feature pipeline (:608-869): wav read + int normalization, resample,
  peak-normalize, stochastic speed perturbation (cache bypass), log-mel
  ``log(mel_power + 1e-9)``, ``max_seq_length`` clip, G2P with inter-word
  ``<sil>`` + prosody tokens + parallel stress IDs, MFA DP-aligned durations
  with frame-sum reconciliation into the last phoneme + min-1 clamp, fallback
  uniform durations with exact frame sum (:581-606), YIN pitch + mel energy
  aligned to mel length with a >1.5 re-normalization guard,
* two-tier cache: bounded in-RAM LRU + on-disk per-utterance files
  (:106-121, :426-520); speed-perturbed samples bypass the cache,
* 90/10 train/val split with seed 42 (reference trainer.py:289).

TPU-native differences: features are numpy ``.npz`` payloads (not torch
pickles); mel/pitch/energy extraction runs through the jitted JAX ops from
``kokoro_tpu.ops`` (on whatever backend is active — TPU during precompute);
stop-token targets are built at batch-assembly time (config-dependent and
cheap) instead of being cached.

Deliberate fix vs reference: speed-perturbed duration rescaling uses the
actual frame-count ratio instead of the reference's ``1/factor`` (which points
the wrong way relative to its own resampling direction — dataset.py:755-760 —
and dumps the mismatch into the last phoneme via reconciliation).  The
reconciliation step itself is preserved.
"""

from __future__ import annotations

import logging
import pickle
import struct
import time
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.data import audio_io, text_utils
from kokoro_tpu.data.phonemes import RussianPhonemeProcessor

logger = logging.getLogger(__name__)

FEATURE_CACHE_VERSION = 1


def build_fallback_durations(num_phonemes: int, num_mel_frames: int) -> np.ndarray:
    """Uniform durations with exact frame-sum (reference dataset.py:581-606)."""
    num_phonemes = max(0, int(num_phonemes))
    num_mel_frames = max(0, int(num_mel_frames))
    if num_phonemes == 0:
        return np.zeros((0,), dtype=np.int32)
    base, rem = divmod(num_mel_frames, num_phonemes)
    out = np.full((num_phonemes,), base, dtype=np.int32)
    out[:rem] += 1
    return out


def _wav_num_samples(path: Path) -> int:
    """Fast sample count from the wav header (no full decode)."""
    try:
        with open(path, "rb") as f:
            header = f.read(12)
            if header[:4] != b"RIFF":
                return 0
            while True:
                chunk = f.read(8)
                if len(chunk) < 8:
                    return 0
                cid, size = chunk[:4], struct.unpack("<I", chunk[4:])[0]
                if cid == b"fmt ":
                    fmt = f.read(size)
                    channels = struct.unpack("<H", fmt[2:4])[0]
                    bits = struct.unpack("<H", fmt[14:16])[0]
                elif cid == b"data":
                    return size // (channels * bits // 8)
                else:
                    f.seek(size, 1)
    except (OSError, struct.error, UnboundLocalError):
        return 0


AUDIO_BUCKET_SAMPLES = 16384  # ~0.74 s at 22.05 kHz


class FeatureExtractor:
    """JAX-backed mel/pitch/energy extraction with bounded compilations.

    Audio is zero-padded up to a multiple of ``AUDIO_BUCKET_SAMPLES`` so XLA
    compiles one program per length bucket (<= ~30 for a 22 s corpus) instead
    of one per distinct utterance length — on a remote-TPU tunnel each compile
    costs seconds, which made unbucketed precompute ~70 s/utterance.  All
    length-adaptive statistics (YIN voicing quantile / energy median, energy
    percentile normalization) are computed over REAL frames only via masked
    quantiles so numerics are padding-invariant.
    """

    def __init__(self, config: TrainingConfig):
        self.config = config
        self._jitted = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        from kokoro_tpu.ops.pitch import _masked_quantile, extract_pitch
        from kokoro_tpu.ops.stft import log_mel_spectrogram

        cfg = self.config

        @jax.jit
        def extract(audio: jnp.ndarray, n_valid: jnp.ndarray):
            log_mel = log_mel_spectrogram(
                audio, cfg.sample_rate, cfg.n_fft, cfg.hop_length,
                cfg.win_length, cfg.n_mels, cfg.f_min, cfg.f_max,
            )
            Tb = log_mel.shape[0]
            valid = jnp.arange(Tb)[None, :] < n_valid
            # energy from LINEAR mel power (reference dataset.py:808-813):
            # mean power -> log1p -> masked 5/95-percentile normalization
            linear_mean = jnp.clip(jnp.mean(jnp.exp(log_mel), axis=-1), 0.0, None)
            energy_raw = jnp.log1p(linear_mean)[None, :]
            floor = _masked_quantile(energy_raw, valid, 0.05)
            ceil = _masked_quantile(energy_raw, valid, 0.95)
            energy = jnp.clip(
                (energy_raw - floor) / jnp.maximum(ceil - floor, 1e-8), 0.0, 1.0
            )[0]
            pitch = extract_pitch(
                audio, cfg.sample_rate, cfg.hop_length,
                cfg.pitch_extract_fmin, cfg.pitch_extract_fmax,
                valid_frames=n_valid,
            )
            return log_mel, pitch, energy

        return extract

    def __call__(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """audio (samples,) float32 -> (log_mel (T,80), pitch (T,), energy (T,))
        sliced to the true frame count T."""
        import jax.numpy as jnp

        cfg = self.config
        if self._jitted is None:
            self._jitted = self._build()
        orig = max(audio.shape[0], cfg.win_length)
        # true frame count (centered STFT): orig // hop + 1, capped
        T = min(orig // cfg.hop_length + 1, cfg.max_seq_length)
        bucket = -(-orig // AUDIO_BUCKET_SAMPLES) * AUDIO_BUCKET_SAMPLES
        max_samples = cfg.max_seq_length * cfg.hop_length + cfg.win_length
        bucket = min(bucket, -(-max_samples // AUDIO_BUCKET_SAMPLES) * AUDIO_BUCKET_SAMPLES)
        padded = np.zeros(bucket, np.float32)
        padded[: min(orig, bucket)] = audio[: min(audio.shape[0], bucket)]
        log_mel, pitch, energy = self._jitted(
            jnp.asarray(padded), jnp.asarray(T, jnp.int32)
        )
        log_mel = np.asarray(log_mel[:T], np.float32)
        pitch = np.asarray(pitch[:T], np.float32)
        energy = np.asarray(energy[:T], np.float32)
        if pitch.shape[0] < T:
            pitch = np.pad(pitch, (0, T - pitch.shape[0]))
        if energy.shape[0] < T:
            energy = np.pad(energy, (0, T - energy.shape[0]))
        # >1.5 re-normalization guard (reference dataset.py:826-841)
        if pitch.size and pitch.max() > 1.5:
            logger.error("Unnormalized pitch detected; force-normalizing")
            pitch = np.clip(pitch / pitch.max(), 0.0, 1.0)
        if energy.size and energy.max() > 1.5:
            logger.error("Unnormalized energy detected; force-normalizing")
            energy = np.clip(energy / energy.max(), 0.0, 1.0)
        return log_mel, pitch, energy


class RuslanDataset:
    """Corpus access + per-utterance feature computation with caching."""

    def __init__(
        self,
        data_dir: str,
        config: TrainingConfig,
        phoneme_processor: Optional[RussianPhonemeProcessor] = None,
        mfa=None,
        indices: Optional[Sequence[int]] = None,
        is_training: bool = True,
    ):
        self.data_dir = Path(data_dir)
        self.config = config
        self.is_training = is_training
        self.phoneme_processor = phoneme_processor or RussianPhonemeProcessor()
        self.mfa = mfa
        self.extractor = FeatureExtractor(config)
        self.use_feature_cache = config.use_feature_cache
        self.feature_cache_dir = Path(config.feature_cache_dir)
        if self.use_feature_cache:
            self.feature_cache_dir.mkdir(parents=True, exist_ok=True)
        # bounded in-memory LRU: entry AND byte bounds with per-tier latency
        # counters (reference :106-121)
        self._memory_cache: OrderedDict[str, Dict] = OrderedDict()
        self._memory_cache_max = 30000 if config.use_memory_cache else 0
        self._memory_cache_max_bytes = 8192 * 1024 * 1024  # 8 GB (reference :109)
        self._memory_cache_bytes = 0
        self._entry_bytes: Dict[str, int] = {}
        self.cache_requests = 0
        self.cache_misses = 0
        self.cache_mem_hits = 0
        self.cache_disk_hits = 0
        self._mem_latency_ns = 0
        self._disk_latency_ns = 0

        self.samples = self._load_samples()
        self._length_cache = self._load_length_metadata()
        # Stable sort by estimated mel length BEFORE applying split indices
        # (reference dataset.py:400 sorts, THEN trainer.py:286-296 splits) —
        # so index i names the SAME utterance in both frameworks and the
        # train/val membership agrees for the head-to-head parity run.
        self.samples.sort(key=lambda s: self._length_cache[s["audio_file"]][0])
        if indices is not None:
            self.samples = [self.samples[i] for i in indices]

    # ------------------------------------------------------------------
    # Corpus enumeration
    # ------------------------------------------------------------------
    def _load_samples(self) -> List[Dict]:
        samples: List[Dict] = []
        meta = None
        for name in ("metadata_RUSLAN_22200.csv", "metadata.csv"):
            f = self.data_dir / name
            if f.exists():
                meta = f
                break
        wav_dir = None
        for name in ("wavs", "wav", "audio", "."):
            d = self.data_dir / name
            if d.is_dir() and any(d.glob("*.wav")):
                wav_dir = d
                break
        if meta is not None:
            for line in meta.read_text(encoding="utf-8").splitlines():
                parts = line.split("|")
                if len(parts) < 2:
                    continue
                stem, text = parts[0].strip(), parts[1].strip()
                path = (wav_dir or self.data_dir) / f"{stem}.wav"
                if path.exists():
                    samples.append(
                        {"audio_file": stem, "audio_path": path, "text": text}
                    )
        elif wav_dir is not None:
            # dir-scan fallback (reference :285-340): .txt next to each wav
            for wav in sorted(wav_dir.glob("*.wav")):
                txt = wav.with_suffix(".txt")
                if txt.exists():
                    samples.append(
                        {
                            "audio_file": wav.stem,
                            "audio_path": wav,
                            "text": txt.read_text(encoding="utf-8").strip(),
                        }
                    )
        if not samples:
            raise FileNotFoundError(
                f"No corpus found under {self.data_dir} (need metadata CSV or "
                "wavs/*.wav + *.txt)"
            )
        return samples

    # ------------------------------------------------------------------
    # Length metadata (for the frame-budget batcher, reference :217-272)
    # ------------------------------------------------------------------
    def _load_length_metadata(self) -> Dict[str, Tuple[int, int]]:
        cache_dir = self.data_dir / ".cache"
        cache_file = cache_dir / "audio_metadata.pkl"
        cached: Dict[str, Tuple[int, int]] = {}
        if cache_file.exists():
            try:
                cached = pickle.loads(cache_file.read_bytes())
            except Exception:
                cached = {}
        updated = False
        for s in self.samples:
            stem = s["audio_file"]
            if stem in cached:
                continue
            n_samples = _wav_num_samples(s["audio_path"])
            n_frames = min(
                n_samples // self.config.hop_length + 1, self.config.max_seq_length
            )
            raw = self.phoneme_processor.process_text(s["text"])
            seq = text_utils.flatten_with_sil(
                raw, self.phoneme_processor.phoneme_to_id
            )
            cached[stem] = (n_frames, len(seq))
            updated = True
        if updated:
            try:
                cache_dir.mkdir(parents=True, exist_ok=True)
                cache_file.write_bytes(pickle.dumps(cached))
            except OSError as err:
                logger.warning("Could not persist audio metadata cache: %s", err)
        return cached

    def lengths(self, idx: int) -> Tuple[int, int]:
        """(mel_frames, phoneme_count) estimate for batching."""
        return self._length_cache[self.samples[idx]["audio_file"]]

    def __len__(self) -> int:
        return len(self.samples)

    # ------------------------------------------------------------------
    # Feature cache
    # ------------------------------------------------------------------
    def _cache_path(self, stem: str) -> Path:
        return self.feature_cache_dir / f"{stem}.npz"

    def _load_cached(self, stem: str) -> Optional[Dict]:
        t0 = time.perf_counter_ns()
        if stem in self._memory_cache:
            self._memory_cache.move_to_end(stem)
            out = dict(self._memory_cache[stem])
            self.cache_mem_hits += 1
            self._mem_latency_ns += time.perf_counter_ns() - t0
            return out
        path = self._cache_path(stem)
        if not path.exists():
            return None
        try:
            with np.load(path, allow_pickle=False) as z:
                if int(z["cache_version"]) != FEATURE_CACHE_VERSION:
                    return None
                payload = {k: z[k] for k in z.files if k != "cache_version"}
        except Exception as err:
            logger.warning("Corrupt feature cache %s: %s", path, err)
            return None
        self._memory_put(stem, payload)
        self.cache_disk_hits += 1
        self._disk_latency_ns += time.perf_counter_ns() - t0
        return dict(payload)

    @staticmethod
    def _payload_bytes(payload: Dict) -> int:
        return sum(
            v.nbytes for v in payload.values() if isinstance(v, np.ndarray)
        )

    def _memory_put(self, stem: str, payload: Dict) -> None:
        if self._memory_cache_max <= 0:
            return
        if stem in self._memory_cache:
            self._memory_cache_bytes -= self._entry_bytes.get(stem, 0)
        size = self._payload_bytes(payload)
        self._memory_cache[stem] = payload
        self._entry_bytes[stem] = size
        self._memory_cache_bytes += size
        self._memory_cache.move_to_end(stem)
        # evict LRU entries past either bound (reference :108-110: 30k entries
        # AND an 8 GB byte budget)
        while self._memory_cache and (
            len(self._memory_cache) > self._memory_cache_max
            or self._memory_cache_bytes > self._memory_cache_max_bytes
        ):
            old, _ = self._memory_cache.popitem(last=False)
            self._memory_cache_bytes -= self._entry_bytes.pop(old, 0)

    def _save_cached(self, stem: str, payload: Dict) -> None:
        if not self.use_feature_cache:
            return
        try:
            np.savez(
                self._cache_path(stem),
                cache_version=FEATURE_CACHE_VERSION,
                **payload,
            )
        except OSError as err:
            logger.warning("Could not write feature cache for %s: %s", stem, err)
        self._memory_put(stem, payload)

    def cache_stats(self) -> Dict[str, float]:
        return {
            "requests": self.cache_requests,
            "misses": self.cache_misses,
            "hit_rate": (
                1.0 - self.cache_misses / self.cache_requests
                if self.cache_requests
                else 0.0
            ),
            "memory_entries": len(self._memory_cache),
            "memory_mb": self._memory_cache_bytes / (1024 * 1024),
            "mem_hits": self.cache_mem_hits,
            "disk_hits": self.cache_disk_hits,
            "mem_latency_ms": (
                self._mem_latency_ns / self.cache_mem_hits / 1e6
                if self.cache_mem_hits else 0.0
            ),
            "disk_latency_ms": (
                self._disk_latency_ns / self.cache_disk_hits / 1e6
                if self.cache_disk_hits else 0.0
            ),
        }

    # ------------------------------------------------------------------
    # Feature computation
    # ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> Dict:
        return self.get_features(idx, np.random.default_rng())

    def get_features(self, idx: int, rng: np.random.Generator) -> Dict:
        sample = self.samples[idx]
        stem = sample["audio_file"]
        self.cache_requests += 1

        cfg = self.config
        perturb = (
            self.is_training
            and cfg.use_speed_perturbation
            and rng.random() < cfg.speed_perturb_prob
        )
        factor = (
            1.0 + rng.uniform(-cfg.speed_perturb_range, cfg.speed_perturb_range)
            if perturb
            else 1.0
        )

        if factor == 1.0:
            cached = self._load_cached(stem)
            if cached is not None:
                cached["text"] = sample["text"]
                cached["audio_file"] = stem
                return cached

        self.cache_misses += 1
        sr, audio = audio_io.read_wav(sample["audio_path"])
        if sr != cfg.sample_rate:
            audio = audio_io.resample(audio, sr, cfg.sample_rate)
        audio = audio_io.peak_normalize(audio)
        if factor != 1.0:
            audio = audio_io.apply_speed_perturbation(audio, cfg.sample_rate, factor)

        log_mel, pitch, energy = self.extractor(audio)
        num_frames = log_mel.shape[0]

        raw = self.phoneme_processor.process_text(sample["text"])
        phoneme_seq = text_utils.flatten_with_sil(
            raw, self.phoneme_processor.phoneme_to_id
        )
        phoneme_indices = np.asarray(
            text_utils.phonemes_to_indices(
                phoneme_seq, self.phoneme_processor.phoneme_to_id
            ),
            np.int32,
        )
        stress = text_utils.stress_indices_with_sil(
            raw, self.phoneme_processor.phoneme_to_id
        )
        stress = (stress + [0] * len(phoneme_indices))[: len(phoneme_indices)]
        stress_indices = np.asarray(stress, np.int32)

        durations = None
        if self.mfa is not None and cfg.use_mfa:
            mfa_durs = self.mfa.get_aligned_durations(stem, phoneme_seq)
            if mfa_durs is not None:
                durations = np.asarray(mfa_durs, np.int64)
                total = durations.sum()
                if factor != 1.0 and total > 0:
                    # proportional rescale to the perturbed frame count
                    durations = np.maximum(
                        np.round(durations * (num_frames / total)).astype(np.int64), 1
                    )
                # frame-sum reconciliation into the last phoneme (ref :763-768)
                diff = num_frames - durations.sum()
                if diff != 0 and durations.size:
                    durations[-1] = max(1, durations[-1] + diff)
                durations = np.maximum(durations, 1)
        if durations is None:
            durations = build_fallback_durations(len(phoneme_indices), num_frames)

        payload = {
            "mel_spec": log_mel,
            "phoneme_indices": phoneme_indices,
            "stress_indices": stress_indices,
            "phoneme_durations": durations.astype(np.int32),
            "pitch": pitch,
            "energy": energy,
            "mel_length": np.int32(num_frames),
            "phoneme_length": np.int32(len(phoneme_indices)),
        }
        if factor == 1.0:
            self._save_cached(stem, payload)
        out = dict(payload)
        out["text"] = sample["text"]
        out["audio_file"] = stem
        return out


def train_val_split(
    n: int, validation_split: float = 0.1, seed: int = 42
) -> Tuple[List[int], List[int]]:
    """90/10 split with a fixed shuffle seed, EXACTLY the reference's recipe
    (reference trainer.py:286-293): shuffle with the Mersenne-Twister seed,
    train = first ``int(n * (1 - split))`` of the permutation, val = the tail.
    Matching the tail-val convention (not just the permutation) means both
    frameworks put the SAME utterances in validation — load-bearing for the
    head-to-head parity run (scripts/parity_run.py)."""
    import random as _random

    indices = list(range(n))
    _random.Random(seed).shuffle(indices)
    split_idx = int(n * (1 - validation_split))
    return indices[:split_idx], indices[split_idx:]
