"""Host data pipeline: dataset loaders, synthetic data, device feeding."""

from lsdm_tpu.data.dataset import ProxDatasetTxt, Humanise, DataLoader, Batch
from lsdm_tpu.data.contact_dataset import (ProxContactDataset, ProxSegDataset,
                                           ProxSegDatasetSeq, ProxSegDatasetVar)
from lsdm_tpu.data.threed_front_dataset import (
    dataset_encoding_factory, filter_function, get_dataset_raw_and_encoded,
    get_encoded_dataset, get_raw_dataset)
