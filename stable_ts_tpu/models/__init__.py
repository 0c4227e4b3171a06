"""Model families. Whisper is the flagship; the engine-agnostic seams in
:mod:`stable_ts_tpu.non_whisper` let any other ASR plug in."""
