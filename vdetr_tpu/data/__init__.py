from vdetr_tpu.data.dataset_config import (
    ScannetDatasetConfig,
    SunrgbdDatasetConfig,
    SyntheticDatasetConfig,
    get_dataset_config,
)
