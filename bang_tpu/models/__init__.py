from bang_tpu.models.index import DeviceIndex, device_index_from_files  # noqa: F401
from bang_tpu.models.exactdistance import search_exact  # noqa: F401
from bang_tpu.models.inmemory import search_inmemory  # noqa: F401
from bang_tpu.models.base import BaseVariantSearcher  # noqa: F401
