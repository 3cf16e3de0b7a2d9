"""Image payload handling: pure-numpy codecs + perceptual hashing.

Images travel as opaque BinaryType columns with typed metadata
(image_id, bytes, w, h, fmt, caption, phash — the north-rule input_hint
shape); decoding happens ONLY inside Arrow-batched UDF stages so Parquet
column pruning keeps the bytes column out of every other stage.
"""

from dagli_spark.images.codec import decode_image, encode_image, psnr
from dagli_spark.images.phash import phash64, phash_to_vector
