from .jpeg import jpeg_decode_gray, jpeg_encode_gray  # noqa: F401
from .nifti import nifti1_bytes, parse_nifti1  # noqa: F401
from .png import png_decode, png_encode  # noqa: F401
from .scalar import dec_to_double  # noqa: F401
