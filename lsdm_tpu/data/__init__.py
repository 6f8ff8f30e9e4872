"""Host data pipeline: dataset loaders, synthetic data, device feeding."""

from lsdm_tpu.data.dataset import ProxDatasetTxt, Humanise, DataLoader, Batch
from lsdm_tpu.data.contact_dataset import (ProxContactDataset, ProxSegDataset,
                                           ProxSegDatasetSeq, ProxSegDatasetVar)
