"""ocrs_ray — a Ray-Data-native content-extraction engine.

Re-expresses the query/data-processing capabilities of the `ocrs` OCR
engine (reference: /root/reference) as streaming `ray.data.Dataset`
pipelines over Arrow batches: text detection, oriented-rect layout
analysis, CTC sequence recognition, and span-sequence reassembly over a
table of interleaved text+media documents, plus the training-data
operators (dedup, similarity search, text analysis) a 100 TB pipeline
needs.

Built from scratch on public knowledge (Ray Data / pyarrow / numpy and
published algorithms); reference file:line citations in docstrings mark
behavior parity points only.
"""

__version__ = "0.1.0"

DEFAULT_ALPHABET = (
    " 0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~E"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)
"""Default recognition alphabet.

Parity: /root/reference/ocrs/src/lib.rs:33-34. The reference notes the
"E" before "ABCDE" should be the EUR symbol; the byte string is
authoritative, so we reproduce it verbatim including that quirk.
"""
