"""Independent AV1 conformance codecs bound at runtime via ctypes.

The container ships system codec libraries (libaom 3.6, libdav1d 6.6,
libgav1, SVT-AV1, rav1e) without dev headers.  This package binds the
stable public C ABI of libaom directly with ctypes and self-calibrates
the few struct layouts it needs, giving the framework:

  * an *independent spec decoder* to conformance-check every bitstream
    the TPU encoder emits (the analog of the reference's live encoder
    self-test, reference binary.go:244-310), and
  * an *independent spec encoder* to generate known-good AV1 streams
    that validate our own parser/decoder understanding of the spec.

Everything degrades gracefully: `aomcodec.available()` is False when
the library is missing, and callers fall back to in-repo decode.
"""

from av1tpu.conformance import aomcodec  # noqa: F401
