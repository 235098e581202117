from .rttm import parse_rttm, read_speaker_timestamps, write_rttm

__all__ = ["parse_rttm", "read_speaker_timestamps", "write_rttm"]
