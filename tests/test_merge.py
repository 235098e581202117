from whisper_nemo_tpu.post import (
    create_readable_transcript_improved,
    merge_transcription_with_speakers_improved,
    smooth_speaker_transitions,
)


def seg(start, end, text, no_speech=0.1):
    return {"start": start, "end": end, "text": text, "no_speech_prob": no_speech}


def turn(start, end, speaker):
    return {"start": start, "end": end, "speaker": speaker}


def test_merge_picks_max_overlap_speaker():
    segments = [seg(0.0, 2.0, " hello "), seg(2.0, 4.0, "world")]
    turns = [turn(0.0, 2.5, "SPEAKER_00"), turn(2.5, 4.0, "SPEAKER_01")]
    merged = merge_transcription_with_speakers_improved(segments, turns)
    assert merged[0]["speaker"] == "SPEAKER_00"
    assert merged[1]["speaker"] == "SPEAKER_01"
    assert merged[0]["text"] == "hello"
    assert abs(merged[0]["confidence"] - 0.9) < 1e-9
    assert merged[0]["overlap_quality"] == 1.0
    assert abs(merged[1]["overlap_quality"] - 0.75) < 1e-9


def test_merge_unknown_when_no_overlap():
    merged = merge_transcription_with_speakers_improved(
        [seg(10.0, 11.0, "x")], [turn(0.0, 1.0, "SPEAKER_00")]
    )
    assert merged[0]["speaker"] == "INCONNU"


def test_smoothing_reassigns_short_sandwiched_segment():
    segments = [
        {"speaker": "A", "duration": 3.0, "overlap_quality": 1.0, "text": "1"},
        {"speaker": "B", "duration": 1.0, "overlap_quality": 0.5, "text": "2"},
        {"speaker": "A", "duration": 3.0, "overlap_quality": 1.0, "text": "3"},
    ]
    out = smooth_speaker_transitions(segments)
    assert out[1]["speaker"] == "A"
    assert out[1]["smoothed"] is True


def test_smoothing_keeps_confident_segment():
    segments = [
        {"speaker": "A", "duration": 3.0, "overlap_quality": 1.0, "text": "1"},
        {"speaker": "B", "duration": 1.0, "overlap_quality": 0.9, "text": "2"},
        {"speaker": "A", "duration": 3.0, "overlap_quality": 1.0, "text": "3"},
    ]
    out = smooth_speaker_transitions(segments)
    assert out[1]["speaker"] == "B"


def test_readable_transcript_sections():
    segments = [seg(0.0, 2.0, "bonjour"), seg(2.0, 4.0, "salut")]
    turns = [turn(0.0, 2.0, "SPEAKER_00"), turn(2.0, 4.0, "SPEAKER_01")]
    merged = merge_transcription_with_speakers_improved(segments, turns)
    text = create_readable_transcript_improved(merged)
    assert "ANALYSE DES PARTICIPANTS" in text
    assert "CONVERSATION CHRONOLOGIQUE" in text
    assert "RÉSUMÉ PAR PARTICIPANT" in text
    assert "SPEAKER_00" in text and "SPEAKER_01" in text


def test_readable_transcript_empty():
    assert (
        create_readable_transcript_improved([])
        == "Aucune transcription disponible."
    )
