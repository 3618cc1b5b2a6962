"""Contact-map runtime: whole-genome bookkeeping and per-chromosome-pair
dense submatrices, mirroring the reference ``utils/contacts_map.py``."""

from chromosight_tpu.runtime.dump import DumpMatrix
from chromosight_tpu.runtime.contact_map import ContactMap
from chromosight_tpu.runtime.genome import HicGenome

__all__ = ["DumpMatrix", "ContactMap", "HicGenome"]
