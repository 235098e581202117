import pytest

from whisper_nemo_tpu.text import (
    LANGUAGES,
    TO_LANGUAGE_CODE,
    langs_to_iso,
    process_language_arg,
    punct_model_langs,
    whisper_langs,
)


def test_tables_shapes():
    assert len(LANGUAGES) == 100
    assert LANGUAGES["en"] == "english"
    assert TO_LANGUAGE_CODE["castilian"] == "es"
    assert TO_LANGUAGE_CODE["english"] == "en"
    assert len(punct_model_langs) == 12
    assert langs_to_iso["en"] == "eng"
    assert langs_to_iso["zh"] == "chi"
    # every whisper language has an ISO-639-2 mapping for the aligner
    assert set(LANGUAGES) == set(langs_to_iso)


def test_whisper_langs_contains_codes_and_titled_names():
    assert "en" in whisper_langs
    assert "English" in whisper_langs


def test_process_language_arg_aliases():
    assert process_language_arg(None, "medium.en") is None
    assert process_language_arg("English", "medium") == "en"
    assert process_language_arg("castilian", "large-v3") == "es"
    assert process_language_arg("EN", "tiny.en") == "en"


def test_process_language_arg_rejections():
    with pytest.raises(ValueError):
        process_language_arg("klingon", "medium")
    with pytest.raises(ValueError):
        process_language_arg("fr", "medium.en")
