"""WhisperEngine: long-form transcription on the JAX engine.

Reproduces the two long-form strategies the reference exercises:

- **batched** (faster-whisper ``BatchedInferencePipeline``, reference
  diarize.py:132-138): VAD-driven chunking into ≤30 s windows, batched
  no-timestamp decoding, window-bounded segment times;
- **sequential** (openai-whisper / faster-whisper buffered decoding,
  reference diarize.py:140-145 and main.py:381-391): 30 s sliding window
  with timestamp tokens, seek driven by the last predicted timestamp,
  temperature fallback gated on compression-ratio / avg-logprob /
  no-speech thresholds, optional conditioning on previous text.

Both produce the same Segment records; the facades in ``asr/`` adapt
them to the faster-whisper tuple contract and the openai-whisper dict
contract.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.devcache import device_waveform

from ..models.whisper import WhisperDims, encode
from ..ops.mel import (
    HOP_LENGTH,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    log_mel_spectrogram_batch,
)
from ..text.languages import LANGUAGES
from ..text.tokenizer import WhisperTokenizer, get_suppressed_tokens
from ..utils import get_logger
from ..vad import get_speech_timestamps
from .checkpoint import resolve_model
from .decode import DecodeOptions, build_suppress_mask, detect_language, greedy_decode

logger = get_logger(__name__)

FRAMES_PER_WINDOW = 3000  # 30 s of 10 ms mel frames
TIME_PER_FRAME = HOP_LENGTH / SAMPLE_RATE  # 0.01 s


@partial(jax.jit, static_argnums=(3,))
def _gather_windows(wave, starts, lengths, n_samples):
    """Zero-padded ≤30 s windows sliced on device from the resident
    waveform: ``out[i] == pad(wave[starts[i]:starts[i]+lengths[i]])``.

    Replaces the host stack-and-upload (30 MB of float32 per batch over
    the host↔device link); only the tiny ``starts``/``lengths`` vectors
    transfer per batch. Windows are contiguous spans, so each row is a
    ``dynamic_slice`` (a straight HBM copy) under ``lax.map`` — NOT a
    per-element gather, which runs ~100× slower on TPU at this size."""
    padded = jnp.concatenate([wave, jnp.zeros(n_samples, wave.dtype)])
    rows = jax.lax.map(
        lambda s: jax.lax.dynamic_slice(padded, (s,), (n_samples,)),
        starts,
    )
    valid = (
        jnp.arange(n_samples, dtype=jnp.int32)[None, :]
        < lengths[:, None]
    )
    return jnp.where(valid, rows, jnp.float32(0.0))


@jax.jit
def _window_at(wave, start_sample):
    """One zero-padded 30 s window at a dynamic offset (the sequential
    path's per-seek slice, without a per-window host upload)."""
    padded = jnp.concatenate(
        [wave, jnp.zeros(N_SAMPLES, wave.dtype)]
    )
    return jax.lax.dynamic_slice(padded, (start_sample,), (N_SAMPLES,))


@dataclass
class Segment:
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: List[int]
    temperature: float = 0.0
    avg_logprob: float = 0.0
    compression_ratio: float = 0.0
    no_speech_prob: float = 0.0
    words: Optional[list] = None


@dataclass
class TranscriptionInfo:
    language: str
    language_probability: float
    duration: float
    duration_after_vad: float = 0.0
    all_language_probs: Optional[list] = None


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _dtype_for_compute_type(compute_type: str):
    # int8 weight quantization is handled separately; compute stays bf16.
    return {
        "default": jnp.float32,
        "float32": jnp.float32,
        "float16": jnp.bfloat16,
        "bfloat16": jnp.bfloat16,
        "int8": jnp.bfloat16,
    }[compute_type]


class WhisperEngine:
    """Model + tokenizer + jitted decode, shared by every API facade."""

    def __init__(
        self,
        model_name: str = "tiny",
        compute_type: str = "default",
        params=None,
        dims: Optional[WhisperDims] = None,
        tokenizer: Optional[WhisperTokenizer] = None,
        device=None,
        kv_bits: Optional[int] = None,
        mesh=None,
    ):
        """``mesh`` activates multi-chip execution: a
        ``jax.sharding.Mesh`` (axes ``dp`` and optionally ``tp``), a
        spec string for ``parallel.mesh.mesh_from_spec`` ("dp=4,tp=2"),
        or None to read the ``WNT_MESH`` environment variable (the
        production configuration surface; empty/unset = single device).
        Pass ``mesh=False`` to force single-device regardless of env.
        With a mesh, parameters are placed with megatron-style TP specs
        (``parallel.sharding``) and the batched path shards its window
        batch over ``dp``."""
        if params is None or dims is None:
            params, dims = resolve_model(model_name)
        if mesh is None:
            mesh_spec = os.environ.get("WNT_MESH", "")
            mesh = None
            if mesh_spec:
                from ..parallel.mesh import mesh_from_spec

                mesh = mesh_from_spec(mesh_spec)
        elif isinstance(mesh, str):
            from ..parallel.mesh import mesh_from_spec

            mesh = mesh_from_spec(mesh)
        elif mesh is False:
            mesh = None
        self.mesh = mesh
        if compute_type == "int8":
            from .quantize import quantize_whisper_params

            params = quantize_whisper_params(params)
        elif _dtype_for_compute_type(compute_type) == jnp.bfloat16:
            # store weights in the compute dtype: keeping them f32 and
            # casting per use doubles the decode loop's HBM weight
            # traffic (the decode step is bandwidth-bound)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                params,
            )
        if device is not None and mesh is None:
            # commit the weights to one device of the slice (the
            # reference's per-GPU placement, main.py:109-130, done the
            # JAX way: computations follow committed arguments, so the
            # whole ASR branch runs where the params live and another
            # branch can own the remaining cores)
            params = jax.device_put(params, device)
        self.device = device
        self.params = params
        self.dims = dims
        self.model_name = model_name
        self.dtype = _dtype_for_compute_type(compute_type)
        # int8 cross-attention KV for reduced-precision compute types:
        # the decode loop's dominant HBM stream halves
        self.kv_int8 = compute_type in ("bfloat16", "float16", "int8")
        # cross-KV storage width: 8 (default) or 4 (packed two values
        # per byte, ops/cross_decode.py) — halves the stream again
        if kv_bits is None:
            kv_bits = int(os.environ.get("WNT_KV_BITS", "8"))
        if kv_bits not in (4, 8):
            raise ValueError(f"kv_bits must be 4 or 8, got {kv_bits}")
        self.kv_bits = kv_bits if self.kv_int8 else 8
        # int8 SELF-attention KV cache — the last bf16 stream in the
        # decode loop (per-position scales fold outside the cache
        # reads, models/whisper_stacked.quantize_kv_t). Off by default
        # pending the on-chip measurement (ROADMAP's open lever);
        # WNT_SELF_KV_INT8=1 enables for A/B runs.
        self.self_kv_int8 = (
            os.environ.get("WNT_SELF_KV_INT8", "0") == "1"
            and self.kv_int8
        )
        self.multilingual = not model_name.endswith(".en")
        if tokenizer is None:
            from .checkpoint import model_cache_dir

            n_langs = 100 if dims.n_vocab >= 51866 else 99
            candidates = [model_cache_dir()]
            if os.sep in model_name:
                candidates.insert(0, os.path.dirname(model_name))
            tokenizer = None
            for vocab_dir in candidates:
                if os.path.exists(os.path.join(vocab_dir, "vocab.json")) or (
                    os.path.exists(os.path.join(vocab_dir, "tokenizer.json"))
                ):
                    tokenizer = WhisperTokenizer.from_dir(
                        vocab_dir, multilingual=self.multilingual
                    )
                    break
            if tokenizer is None:
                tokenizer = WhisperTokenizer.byte_fallback(
                    multilingual=self.multilingual, n_languages=n_langs
                )
        self.tokenizer = tokenizer
        # pre-stack decoder layers: the greedy decode loop compiles one
        # scan body instead of n_text_layer unrolled layer graphs
        if isinstance(self.params, dict) and "decoder" in self.params and (
            "blocks" in self.params["decoder"]
        ):
            from ..models.whisper_stacked import stack_decoder_blocks

            self._params_stacked = stack_decoder_blocks(self.params)
        else:
            self._params_stacked = None
        if self.mesh is not None:
            # place both trees with TP specs (replicated when the mesh
            # has no tp axis); stacking happens BEFORE sharding so the
            # stacked leaves get their own explicit placement
            from ..parallel.sharding import shard_whisper_params

            self.params = shard_whisper_params(
                self.params, self.mesh, self.dims
            )
            if self._params_stacked is not None:
                self._params_stacked = shard_whisper_params(
                    self._params_stacked, self.mesh, self.dims
                )
        self._opts_base = self._make_opts()

    def _make_opts(self, **over) -> DecodeOptions:
        t = self.tokenizer
        try:
            blank = t.encode(" ")[0]
        except Exception:
            blank = 220
        kw = dict(
            eot=t.eot,
            sot=t.sot,
            no_speech=t.no_speech,
            no_timestamps=t.no_timestamps,
            timestamp_begin=t.timestamp_begin,
            blank_token=blank,
            # measured NEGATIVE on chip (2026-08-19, medium.en b32
            # int8, 220 steps / cache_len 256: greedy 8.38→12.87
            # ms/step, beam 48.77→50.30 — the lax.switch dispatch
            # costs more than the prefix DMA saves), so default OFF;
            # WNT_SELF_PREFIX_BUCKETS=1 re-enables for A/B
            self_prefix_buckets=(
                os.environ.get("WNT_SELF_PREFIX_BUCKETS", "0") == "1"
            ),
            # beam ancestry-selection formulation (both exact;
            # ops.attention.attention_kt_ancestry) — A/B knob
            anc_select=os.environ.get("WNT_ANC_SELECT", "einsum"),
        )
        kw.update(over)
        return DecodeOptions(**kw)

    def unload(self) -> None:
        """Release device buffers and compiled executables.

        The TPU equivalent of the reference's stage-serial VRAM
        multiplexing (``del model; torch.cuda.empty_cache()``,
        diarize.py:150-151): parameters are deleted (donating their HBM
        back to the allocator) and cached jits dropped so the next
        stage can claim the memory."""
        for tree in (self.params, getattr(self, "_params_stacked", None)):
            for leaf in jax.tree_util.tree_leaves(tree):
                if hasattr(leaf, "delete"):
                    try:
                        leaf.delete()
                    except Exception:
                        pass
        self.params = None
        self._params_stacked = None
        if hasattr(self, "_encode_cached"):
            del self._encode_cached
        import gc

        gc.collect()

    # -- helpers ----------------------------------------------------------
    def mel_window(self, audio: np.ndarray) -> jnp.ndarray:
        """Pad/trim a ≤30 s chunk to exactly 30 s and compute mel."""
        chunk = np.zeros(N_SAMPLES, np.float32)
        n = min(len(audio), N_SAMPLES)
        chunk[:n] = audio[:n]
        return log_mel_spectrogram(jnp.asarray(chunk), n_mels=self.dims.n_mels)

    def encode_windows(self, mels: jnp.ndarray) -> jnp.ndarray:
        """[B, n_mels, 3000] -> [B, 1500, D]."""
        return self._encode_jit(self.params, mels)

    @property
    def _encode_jit(self):
        if not hasattr(self, "_encode_cached"):
            dims, dtype = self.dims, self.dtype
            self._encode_cached = jax.jit(
                lambda p, m: encode(p, m, dims, dtype)
            )
        return self._encode_cached

    def detect_language(
        self, audio: np.ndarray, return_all: bool = False
    ):
        """Language ID from the first 30 s window (contract: the
        ``info.language`` field consumed at reference diarize.py:173).
        With ``return_all``, also returns the full (code, prob) list
        sorted by probability (faster-whisper's all_language_probs)."""
        if not self.multilingual:
            return ("en", 1.0, [("en", 1.0)]) if return_all else ("en", 1.0)
        mel = self.mel_window(audio)[None]
        feats = self.encode_windows(mel)
        idx, probs = detect_language(
            self.params,
            feats,
            self.dims,
            self.tokenizer.sot,
            self.tokenizer.layout.language_start,
            self.tokenizer.layout.n_languages,
            self.dtype,
        )
        codes = list(LANGUAGES.keys())[: self.tokenizer.layout.n_languages]
        i = int(np.asarray(idx)[0])
        if not return_all:
            return codes[i], float(np.asarray(probs)[0, i])
        p = np.asarray(probs)[0]
        ranked = sorted(
            zip(codes, p.tolist()), key=lambda cp: -cp[1]
        )
        return codes[i], float(p[i]), ranked

    PREV_BLOCK = 65  # fixed slots for <|startofprev|> + conditioning tail

    def _decode_batch(
        self,
        feats: jnp.ndarray,
        language: Optional[str],
        suppress_mask: np.ndarray,
        without_timestamps: bool,
        temperature: float,
        rng_seed: int = 0,
        min_new_tokens: int = 0,
        previous_tokens: Optional[Sequence[int]] = None,
        sync: bool = True,
        beam_size: int = 1,
        max_new_tokens: Optional[int] = None,
        task: str = "transcribe",
    ):
        b = feats.shape[0]
        sot_seq = self.tokenizer.sot_sequence(
            language if self.multilingual else None,
            task,
            without_timestamps=without_timestamps,
        )
        # conditioning block must leave room for the prompt and a
        # meaningful generation budget within n_text_ctx
        pb = min(
            self.PREV_BLOCK,
            max(0, self.dims.n_text_ctx - len(sot_seq) - 64),
        )
        if previous_tokens is not None and pb == 0:
            previous_tokens = None
        n_prompt = len(sot_seq) + (pb if previous_tokens is not None else 0)
        opts = self._make_opts(
            without_timestamps=without_timestamps,
            temperature=float(temperature),
            min_new_tokens=min_new_tokens,
            max_new_tokens=min(
                max_new_tokens or 224, self.dims.n_text_ctx - n_prompt
            ),
        )
        if previous_tokens is None:
            prompt_arr = jnp.tile(
                jnp.asarray(sot_seq, jnp.int32)[None], (b, 1)
            )
            prompt_valid = None
        else:
            # fixed-size left-padded conditioning block keeps one
            # compiled decode shape across windows; padded slots are
            # attention-masked and position-shifted out
            block = np.full((b, pb), self.tokenizer.eot, np.int32)
            valid = np.zeros((b, pb), bool)
            tail = list(previous_tokens)[-(pb - 1):]
            if tail:
                block[:, pb - len(tail) - 1] = (
                    self.tokenizer.layout.startofprev
                )
                block[:, pb - len(tail):] = tail
                valid[:, pb - len(tail) - 1:] = True
            prompt_np = np.concatenate(
                [block, np.tile(np.asarray(sot_seq, np.int32), (b, 1))],
                axis=1,
            )
            prompt_arr = jnp.asarray(prompt_np)
            prompt_valid = jnp.asarray(
                np.concatenate(
                    [valid, np.ones((b, len(sot_seq)), bool)], axis=1
                )
            )
        decode_params = (
            self._params_stacked
            if self._params_stacked is not None
            else self.params
        )
        if beam_size > 1 and temperature == 0.0:
            from .decode import beam_decode

            tokens, length, sum_logprob, no_speech = beam_decode(
                decode_params,
                feats,
                prompt_arr,
                jnp.asarray(suppress_mask),
                self.dims,
                opts,
                n_prompt=n_prompt,
                beam_size=beam_size,
                dtype=self.dtype,
                kv_int8=self.kv_int8,
                kv_bits=self.kv_bits,
                prompt_valid=prompt_valid,
                self_kv_int8=self.self_kv_int8,
            )
        else:
            tokens, length, sum_logprob, no_speech = greedy_decode(
                decode_params,
                feats,
                prompt_arr,
                jnp.asarray(suppress_mask),
                self.dims,
                opts,
                n_prompt=n_prompt,
                rng=jax.random.PRNGKey(rng_seed),
                dtype=self.dtype,
                prompt_valid=prompt_valid,
                kv_int8=self.kv_int8,
                kv_bits=self.kv_bits,
                self_kv_int8=self.self_kv_int8,
            )
        if not sync:
            # leave results on device: lets the caller dispatch the next
            # batch's transfer/compute before synchronizing
            return tokens, length, sum_logprob, no_speech, n_prompt
        # one batched transfer wave: four serialized np.asarray syncs
        # cost ~4 tunnel round-trips (~25 ms each) per WINDOW on the
        # sequential path
        tokens, length, sum_logprob, no_speech = jax.device_get(
            (tokens, length, sum_logprob, no_speech)
        )
        return tokens, length, sum_logprob, no_speech, n_prompt

    # -- batched long-form -------------------------------------------------
    def transcribe_batched(
        self,
        audio: np.ndarray,
        language: Optional[str] = None,
        suppress_tokens: Sequence[int] = (-1,),
        batch_size: int = 8,
        without_timestamps: bool = True,
        use_vad: bool = True,
        min_new_tokens: int = 0,
        max_new_tokens: Optional[int] = None,
        beam_size: int = 1,
        task: str = "transcribe",
    ) -> Tuple[List[Segment], TranscriptionInfo]:
        import time as _time

        t_enter = _time.time()
        duration = len(audio) / SAMPLE_RATE
        if use_vad:
            spans = get_speech_timestamps(audio)
            if not spans:
                spans = [{"start": 0, "end": len(audio)}]
        else:
            spans = [{"start": 0, "end": len(audio)}]

        windows = _merge_spans_into_windows(spans, N_SAMPLES)
        duration_after_vad = sum(
            (w[1] - w[0]) for w in windows
        ) / SAMPLE_RATE

        all_lang_probs = None
        if language is None:
            language, lang_prob, all_lang_probs = self.detect_language(
                audio[windows[0][0] : windows[0][1]], return_all=True
            )
        else:
            lang_prob = 1.0

        suppress_mask = build_suppress_mask(
            self.dims.n_vocab,
            get_suppressed_tokens(self.tokenizer, suppress_tokens),
        )

        debug = os.environ.get("WNT_DEBUG_TIMING")
        t0 = _time.time()

        dp_sharding = None
        if self.mesh is not None and "dp" in self.mesh.axis_names:
            # window batches shard over the mesh's dp axis (SURVEY P3 /
            # BASELINE config 5: 30 s decode windows are independent
            # data-parallel work items); the batch rounds up to a dp
            # multiple so every chip holds the same window count
            from jax.sharding import NamedSharding, PartitionSpec

            n_dp = self.mesh.shape["dp"]
            batch_size = -(-batch_size // n_dp) * n_dp
            dp_sharding = NamedSharding(
                self.mesh, PartitionSpec("dp", None, None)
            )

        # dispatch every batch asynchronously (JAX queues the transfers
        # and computations; batch i+1's H2D overlaps batch i's decode),
        # then synchronize once at the end
        wave_dev = device_waveform(audio)
        pending = []
        for batch_start in range(0, len(windows), batch_size):
            batch = windows[batch_start : batch_start + batch_size]
            # the final partial batch is zero-padded to keep one
            # compiled shape per batch size; windows are gathered on
            # device from the resident waveform (no bulk re-upload)
            starts = np.zeros(batch_size, np.int32)
            lengths = np.zeros(batch_size, np.int32)
            for i, (s, e) in enumerate(batch):
                starts[i] = s
                lengths[i] = min(e - s, N_SAMPLES)
            waves = _gather_windows(
                wave_dev, jnp.asarray(starts), jnp.asarray(lengths),
                N_SAMPLES,
            )
            mels = log_mel_spectrogram_batch(waves, self.dims.n_mels)
            if dp_sharding is not None:
                mels = jax.device_put(mels, dp_sharding)
            feats = self.encode_windows(mels)
            out = self._decode_batch(
                feats, language, suppress_mask, without_timestamps, 0.0,
                min_new_tokens=min_new_tokens, sync=False,
                beam_size=beam_size, max_new_tokens=max_new_tokens,
                task=task,
            )
            pending.append((batch, out))

        segments: List[Segment] = []
        for batch, (tokens_d, lengths_d, sum_lp_d, no_speech_d, n_prompt) in pending:
            tokens, lengths, sum_lp, no_speech = jax.device_get(
                (tokens_d, lengths_d, sum_lp_d, no_speech_d)
            )
            for i, (s, e) in enumerate(batch):
                toks = tokens[i, n_prompt : n_prompt + lengths[i]].tolist()
                text = self.tokenizer.decode(toks)
                avg_lp = float(sum_lp[i]) / (int(lengths[i]) + 1)
                segments.append(
                    Segment(
                        id=len(segments),
                        seek=s // HOP_LENGTH,
                        start=s / SAMPLE_RATE,
                        end=e / SAMPLE_RATE,
                        text=text,
                        tokens=toks,
                        avg_logprob=avg_lp,
                        compression_ratio=compression_ratio(text),
                        no_speech_prob=float(no_speech[i]),
                    )
                )
        if debug:
            logger.info(
                "asr timing: windows=%d pre=%.2fs device+collect=%.2fs",
                len(windows), t0 - t_enter, _time.time() - t0,
            )
        info = TranscriptionInfo(
            language=language,
            language_probability=lang_prob,
            duration=duration,
            duration_after_vad=duration_after_vad,
            all_language_probs=all_lang_probs,
        )
        return segments, info

    # -- sequential long-form ----------------------------------------------
    def transcribe_sequential(
        self,
        audio: np.ndarray,
        language: Optional[str] = None,
        suppress_tokens: Sequence[int] = (-1,),
        vad_filter: bool = False,
        temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        condition_on_previous_text: bool = True,
        without_timestamps: bool = False,
        beam_size: int = 1,
        task: str = "transcribe",
        initial_prompt: Optional[str] = None,
        min_new_tokens: int = 0,
        max_new_tokens: Optional[int] = None,
    ) -> Tuple[List[Segment], TranscriptionInfo]:
        duration = len(audio) / SAMPLE_RATE
        time_map = None  # [(concat_start_s, orig_start_s, dur_s)]
        if vad_filter:
            spans = get_speech_timestamps(audio)
            if spans:
                keep = np.concatenate(
                    [audio[s["start"] : s["end"]] for s in spans]
                )
                time_map = []
                offset = 0.0
                for s in spans:
                    dur = (s["end"] - s["start"]) / SAMPLE_RATE
                    time_map.append(
                        (offset, s["start"] / SAMPLE_RATE, dur)
                    )
                    offset += dur
                audio = keep
        duration_after_vad = len(audio) / SAMPLE_RATE

        all_lang_probs = None
        if language is None:
            language, lang_prob, all_lang_probs = self.detect_language(
                audio, return_all=True
            )
        else:
            lang_prob = 1.0

        suppress_mask = build_suppress_mask(
            self.dims.n_vocab,
            get_suppressed_tokens(self.tokenizer, suppress_tokens),
        )

        content_frames = len(audio) // HOP_LENGTH
        wave_dev = device_waveform(audio)
        seek = 0
        segments: List[Segment] = []
        ts_begin = self.tokenizer.timestamp_begin
        all_tokens: List[int] = []  # conditioning history
        if initial_prompt:
            # user-supplied context conditions the first window even
            # with condition_on_previous_text=False (faster-whisper's
            # initial_prompt contract)
            all_tokens.extend(
                self.tokenizer.encode(" " + initial_prompt.strip())
            )
        prompt_reset_since = 0

        while seek < content_frames:
            time_offset = seek * TIME_PER_FRAME
            window_frames = min(FRAMES_PER_WINDOW, content_frames - seek)
            # per-seek window sliced on device from the resident
            # waveform (the host slice+upload cost ~80 ms/window on the
            # tunnel, serially on this latency-bound path)
            window = _window_at(wave_dev, seek * HOP_LENGTH)
            mel = log_mel_spectrogram(window, n_mels=self.dims.n_mels)[None]
            feats = self.encode_windows(mel)

            previous = all_tokens[prompt_reset_since:] or None

            result = None
            for ti, temp in enumerate(temperatures):
                tokens, lengths, sum_lp, no_speech, n_prompt = (
                    self._decode_batch(
                        feats,
                        language,
                        suppress_mask,
                        without_timestamps,
                        temp,
                        rng_seed=seek + ti,
                        previous_tokens=previous,
                        beam_size=beam_size,
                        task=task,
                        min_new_tokens=min_new_tokens,
                        max_new_tokens=max_new_tokens,
                    )
                )
                toks = tokens[0, n_prompt : n_prompt + lengths[0]].tolist()
                text = self.tokenizer.decode(toks)
                avg_lp = float(sum_lp[0]) / (int(lengths[0]) + 1)
                cr = compression_ratio(text)
                needs_fallback = (
                    cr > compression_ratio_threshold
                    or avg_lp < logprob_threshold
                )
                result = (toks, text, avg_lp, cr, float(no_speech[0]), temp)
                if not needs_fallback:
                    break

            toks, text, avg_lp, cr, no_speech_p, temp = result

            # silent-window skip (reference D8 threshold semantics)
            if (
                no_speech_p > no_speech_threshold
                and avg_lp < logprob_threshold
            ):
                seek += window_frames
                continue

            window_duration = window_frames * TIME_PER_FRAME
            new_segments, frames_consumed = _split_on_timestamps(
                toks,
                ts_begin,
                time_offset,
                window_duration,
                window_frames,
            )
            for s_toks, s_start, s_end in new_segments:
                s_text = self.tokenizer.decode(s_toks)
                if not s_text.strip():
                    continue
                segments.append(
                    Segment(
                        id=len(segments),
                        seek=seek,
                        start=s_start,
                        end=s_end,
                        text=s_text,
                        tokens=s_toks,
                        temperature=temp,
                        avg_logprob=avg_lp,
                        compression_ratio=cr,
                        no_speech_prob=no_speech_p,
                    )
                )
            all_tokens.extend(toks)
            seek += frames_consumed
            if temp > 0.5 or not condition_on_previous_text:
                # high-temperature fallback output is unreliable
                # context; without conditioning, only initial_prompt
                # (already consumed) ever reaches the decoder
                prompt_reset_since = len(all_tokens)

        if time_map is not None:
            # map segment times from VAD-concatenated audio back to the
            # original recording (piecewise per speech chunk — the
            # faster-whisper vad_filter timestamp-restoration contract)
            for seg in segments:
                seg.start = _restore_vad_time(seg.start, time_map)
                seg.end = _restore_vad_time(seg.end, time_map)

        info = TranscriptionInfo(
            language=language,
            language_probability=lang_prob,
            duration=duration,
            duration_after_vad=duration_after_vad,
            all_language_probs=all_lang_probs,
        )
        return segments, info


def _restore_vad_time(t: float, time_map) -> float:
    """Concatenated-audio time → original-recording time."""
    for concat_start, orig_start, dur in time_map:
        if t <= concat_start + dur:
            return orig_start + max(0.0, t - concat_start)
    last_c, last_o, last_d = time_map[-1]
    return last_o + last_d + (t - last_c - last_d)


def _merge_spans_into_windows(
    spans: List[dict], max_samples: int
) -> List[Tuple[int, int]]:
    """Merge VAD spans into decode windows of at most 30 s.

    Adjacent spans pack into one window while the combined extent stays
    under ``max_samples``; an oversized single span is sliced into 30 s
    pieces.
    """
    windows: List[Tuple[int, int]] = []
    cur_start = cur_end = None
    for span in spans:
        s, e = span["start"], span["end"]
        while e - s > max_samples:  # slice giant spans
            if cur_start is not None:
                windows.append((cur_start, cur_end))
                cur_start = cur_end = None
            windows.append((s, s + max_samples))
            s += max_samples
        if cur_start is None:
            cur_start, cur_end = s, e
        elif e - cur_start <= max_samples:
            cur_end = e
        else:
            windows.append((cur_start, cur_end))
            cur_start, cur_end = s, e
    if cur_start is not None:
        windows.append((cur_start, cur_end))
    return windows


def _split_on_timestamps(
    tokens: List[int],
    ts_begin: int,
    time_offset: float,
    window_duration: float,
    window_frames: int,
) -> Tuple[List[Tuple[List[int], float, float]], int]:
    """Split decoded tokens into (tokens, start_s, end_s) segments.

    Consecutive timestamp tokens mark segment boundaries; a trailing
    lone timestamp sets how far the window actually consumed audio
    (whisper's seek rule). Returns (segments, frames_consumed).
    """
    ts_value = lambda t: (t - ts_begin) * 0.02

    if not any(t >= ts_begin for t in tokens):
        # no timestamps at all: one segment spanning the window
        return (
            [(tokens, time_offset, time_offset + window_duration)],
            window_frames,
        )

    # pattern: <t0> text <t1><t2> text <t3> ...; a segment is the text
    # between a start timestamp and the next timestamp token
    segments = []
    prev_ts_val = 0.0
    consumed = window_frames
    pending_start: Optional[float] = None
    seg_tokens: List[int] = []
    for tok in tokens:
        if tok >= ts_begin:
            if pending_start is None:
                pending_start = ts_value(tok)
                seg_tokens = []
            else:
                segments.append(
                    (
                        seg_tokens,
                        time_offset + pending_start,
                        time_offset + ts_value(tok),
                    )
                )
                prev_ts_val = ts_value(tok)
                pending_start = None
                seg_tokens = []
        else:
            seg_tokens.append(tok)
    if pending_start is not None and seg_tokens:
        # open segment at window end
        segments.append(
            (
                seg_tokens,
                time_offset + pending_start,
                time_offset + window_duration,
            )
        )
        consumed = window_frames
    elif prev_ts_val > 0:
        consumed = min(window_frames, max(1, int(round(prev_ts_val / 0.01))))
    if not segments and seg_tokens:
        segments.append(
            (seg_tokens, time_offset, time_offset + window_duration)
        )
    return segments, consumed
