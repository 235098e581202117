from whisper_nemo_tpu.diarize import (
    parse_rttm,
    read_speaker_timestamps,
    write_rttm,
)


def test_rttm_roundtrip(tmp_path):
    turns = [(0.0, 1.5, 0), (1.5, 3.25, 1), (3.25, 4.0, 0)]
    path = tmp_path / "mono_file.rttm"
    write_rttm(str(path), turns)
    parsed = read_speaker_timestamps(str(path))
    assert parsed == [[0, 1500, 0], [1500, 3250, 1], [3250, 4000, 0]]


def test_parse_rttm_reference_field_positions():
    # NeMo spacing: the reference's split(" ") parser reads positions
    # 5/8/11, which requires the triple-space columns below.
    line = (
        "SPEAKER mono_file 1   12.340   2.500 <NA> <NA> speaker_3 <NA> <NA>\n"
    )
    fields = line.split(" ")
    assert float(fields[5]) == 12.340  # reference diarize.py:214
    assert float(fields[8]) == 2.500
    assert fields[11] == "speaker_3"
    assert parse_rttm([line]) == [[12340, 14840, 3]]

    # single-space variant still parses here
    single = "SPEAKER f 1 1.000 0.500 <NA> <NA> speaker_0 <NA> <NA>\n"
    assert parse_rttm([single]) == [[1000, 1500, 0]]


def test_parse_rttm_ignores_non_speaker_lines():
    assert parse_rttm(["", "SPKR-INFO x 1 0 0 <NA> <NA> a <NA> <NA>"]) == []
