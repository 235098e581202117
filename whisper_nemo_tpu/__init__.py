"""whisper_nemo_tpu — a TPU-native speaker-diarized transcription framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``johnx102/whisper-nemo`` (reference mounted at /root/reference):

- ``audio``      : host-side decode (C++/libav) + Pallas log-mel front end
- ``models``     : Whisper, wav2vec2 aligner, MarbleNet VAD, TitaNet,
                   MSDD, punctuation restorer — pure-functional JAX
- ``engine``     : shared TPU inference engine (weights, KV cache,
                   jitted decode loops, chunk scheduler)
- ``ops``        : Pallas kernels (mel/STFT, attention, CTC Viterbi scan)
- ``align``      : CTC forced alignment (ctc-forced-aligner-compatible API)
- ``diarize``    : VAD → multiscale embeddings → NME-SC clustering → MSDD
- ``post``       : speaker mapping / realignment / writers
- ``parallel``   : meshes, shardings, branch-parallel orchestration
- ``serving``    : job-queue handler with the reference's JSON schema
"""

__version__ = "0.1.0"
