"""Spec-conformant AV1 bitstream layer (decode + syntax helpers).

This package implements the *real* AV1 bitstream — the syntax in the
"AV1 Bitstream & Decoding Process Specification" — replacing round 1's
private "av1tpu profile".  It provides:

  * a from-scratch spec decoder (numpy host code, used for conformance
    tests and the daemon's decode-verify gate), and
  * the syntax/CDF tables shared with the TPU encoder's bitstream
    writer.

Independence of the conformance check is preserved by also decoding
every stream with system libaom (av1tpu.conformance.aomcodec); this
in-repo decoder exists so tests can localize *where* a mismatch
happens (symbol-by-symbol), which a black-box decoder cannot.

Reference parity note: the upstream reference daemon (av1-go) emits
spec AV1 via its ffmpeg child (transcode.go:119-123); this package is
what makes the TPU engine's output equally universally decodable.
"""
