from .avro import avro_ocf_bytes, read_avro_ocf  # noqa: F401
from .gif import gif_decode_gray, gif_encode_gray  # noqa: F401
from .jpeg import jpeg_decode_gray, jpeg_encode_gray  # noqa: F401
from .nifti import nifti1_bytes, parse_nifti1  # noqa: F401
from .png import png_decode, png_encode  # noqa: F401
from .protowire import decode_stream, encode_stream  # noqa: F401
from .scalar import dec_to_double  # noqa: F401
