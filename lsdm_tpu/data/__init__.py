"""Host data pipeline: dataset loaders, synthetic data, device feeding."""

from lsdm_tpu.data.dataset import ProxDatasetTxt, Humanise, DataLoader, Batch
