#!/usr/bin/env python
"""Diagnose a collapsed formant-voice DER case (conf ~0.5).

Replicates diarize_waveform up to the clustering labels for one seed
and reports, per base segment: the true speaker (from the synthetic
ground truth), the cluster label, plus affinity statistics
(within-speaker vs between-speaker mean cosine affinity per scale and
for the weighted multiscale matrix). Distinguishes "embeddings carry
no speaker signal" (a synthesis/embedder property — the test is
unpinnable there) from "embeddings separate but clustering splits on
another axis" (a pipeline bug worth chasing).
"""

import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["WNT_TEST_SMALL_MODELS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)
sys.path.insert(0, os.path.join(root, "tests"))

import jax.numpy as jnp
import numpy as np

from test_e2e_quality import VOICE_A, VOICE_B, _make_formant_session

from whisper_nemo_tpu.config import create_config
from whisper_nemo_tpu.diarize.clustering import (
    longform_cluster,
    multiscale_affinity,
)
from whisper_nemo_tpu.diarize.pipeline import NeuralDiarizer
from whisper_nemo_tpu.diarize.segments import (
    map_scales_to_base,
    multiscale_segmentation,
)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    tmp = tempfile.mkdtemp(prefix="probe_diag")
    dia = NeuralDiarizer(create_config(tmp))
    audio, ref = _make_formant_session(120, seed, (VOICE_A, VOICE_B))

    d = dia.cfg.diarizer
    emb_cfg = d.speaker_embeddings.parameters
    regions = dia._speech_regions(audio)
    scales = multiscale_segmentation(
        regions,
        emb_cfg.window_length_in_sec,
        emb_cfg.shift_length_in_sec,
    )
    base_segments = scales[-1]
    features = dia._full_audio_features(audio)
    scale_embs = [
        dia._embed_segments(features, segs, w)
        for segs, w in zip(scales, emb_cfg.window_length_in_sec)
    ]
    mapping = map_scales_to_base(scales)
    weights = np.asarray(emb_cfg.multiscale_weights, np.float64)
    weights = weights / weights.sum()
    mapped = [
        jnp.take(scale_embs[si], jnp.asarray(mapping[si]), axis=0)
        for si in range(len(scales))
    ]
    stacked = jnp.stack(mapped)
    aff = np.asarray(multiscale_affinity(stacked, weights), np.float64)

    # true speaker per base segment (midpoint lookup; -1 = gap)
    def true_spk(seg):
        mid = 0.5 * (seg.start + seg.end)
        for s, e, spk in ref:
            if s <= mid <= e:
                return spk
        return -1

    truth = np.array([true_spk(s) for s in base_segments])
    cl = d.clustering.parameters
    labels = np.asarray(
        longform_cluster(
            jnp.concatenate(mapped, axis=1),
            num_speakers=2,
            max_num_speakers=cl.max_num_speakers,
            chunk_cluster_count=cl.chunk_cluster_count,
            embeddings_per_chunk=cl.embeddings_per_chunk,
            max_rp_threshold=cl.max_rp_threshold,
            sparse_search_volume=cl.sparse_search_volume,
            affinity=jnp.asarray(aff),
            min_num_speakers=1,
            enhanced_count_thres=cl.enhanced_count_thres,
            maj_vote_spk_count=cl.maj_vote_spk_count,
        )
    )

    n = len(base_segments)
    print(f"seed={seed} n_base={n} truth counts "
          f"{np.bincount(truth[truth >= 0])}")
    ok = truth >= 0
    t, l = truth[ok], labels[ok]
    agree = max((l == t).mean(), (l == 1 - t).mean())
    print(f"label-vs-truth agreement (best of 2 mappings): {agree:.3f}")

    # affinity margins
    same = (t[:, None] == t[None, :])
    a = aff[np.ix_(ok.nonzero()[0], ok.nonzero()[0])]
    off = ~np.eye(len(t), dtype=bool)
    print(f"multiscale affinity: within={a[same & off].mean():.4f} "
          f"between={a[~same].mean():.4f}")
    for si in range(stacked.shape[0]):
        e = np.asarray(mapped[si], np.float64)[ok]
        e = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-12)
        c = e @ e.T
        print(f"  scale {si}: within={c[same & off].mean():.4f} "
              f"between={c[~same].mean():.4f}")

    # what axis do the wrong clusters align with? report cluster
    # composition over time halves and burst parity
    seg_mid = np.array(
        [0.5 * (s.start + s.end) for s in base_segments])[ok]
    half = (seg_mid > np.median(seg_mid)).astype(int)
    agree_half = max((l == half).mean(), (l == 1 - half).mean())
    print(f"label-vs-time-half agreement: {agree_half:.3f}")

    # per-burst index
    burst_idx = np.full(len(t), -1)
    for bi, (s, e, _) in enumerate(ref):
        inside = (seg_mid >= s) & (seg_mid <= e)
        burst_idx[inside] = bi
    # purity of labels within each burst
    purities = []
    for bi in np.unique(burst_idx):
        if bi < 0:
            continue
        lb = l[burst_idx == bi]
        if len(lb):
            purities.append(max((lb == 0).mean(), (lb == 1).mean()))
    print(f"mean within-burst label purity: {np.mean(purities):.3f}")


if __name__ == "__main__":
    main()
