from lrcn_tpu.models import lrcn  # noqa: F401
