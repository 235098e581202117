import json

import pytest

from whisper_nemo_tpu.config import create_config, domain_config


def test_domain_presets_differ():
    tel = domain_config("telephonic")
    meet = domain_config("meeting")
    gen = domain_config("general")
    assert tel.diarizer.vad.parameters.window_length_in_sec == 0.15
    assert meet.diarizer.vad.parameters.onset == 0.9
    assert meet.diarizer.msdd_model.model_path is None
    assert len(meet.diarizer.speaker_embeddings.parameters.window_length_in_sec) == 6
    assert gen.diarizer.clustering.parameters.sparse_search_volume == 10
    assert len(gen.diarizer.speaker_embeddings.parameters.window_length_in_sec) == 3


def test_unknown_domain_rejected():
    with pytest.raises(ValueError):
        domain_config("concert")


def test_create_config_overrides_and_manifest(tmp_path):
    cfg = create_config(str(tmp_path))
    d = cfg.diarizer
    assert cfg.num_workers == 0
    assert d.vad.parameters.onset == 0.8
    assert d.vad.parameters.offset == 0.6
    assert d.vad.parameters.pad_offset == -0.05
    assert d.speaker_embeddings.model_path == "titanet_large"
    assert d.msdd_model.model_path == "diar_msdd_telephonic"
    assert d.oracle_vad is False
    assert d.clustering.parameters.oracle_num_speakers is False

    manifest_path = tmp_path / "data" / "input_manifest.json"
    assert str(manifest_path) == d.manifest_filepath
    entry = json.loads(manifest_path.read_text().strip())
    assert entry["audio_filepath"].endswith("mono_file.wav")
    assert entry["label"] == "infer"
    assert entry["text"] == "-"
    assert entry["duration"] is None


def test_telephonic_clustering_defaults():
    cfg = domain_config("telephonic")
    p = cfg.diarizer.clustering.parameters
    assert p.max_num_speakers == 8
    assert p.enhanced_count_thres == 80
    assert p.max_rp_threshold == 0.25
    assert p.chunk_cluster_count == 50
    assert p.embeddings_per_chunk == 10000
