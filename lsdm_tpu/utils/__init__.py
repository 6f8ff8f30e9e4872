"""Support utilities: logging, seeding, profiling, bbox translation."""

from lsdm_tpu.utils.logger import KVLogger
from lsdm_tpu.utils.fixseed import fixseed
