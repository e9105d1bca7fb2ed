from .dictionary import Dictionary, post_process, tokenize_line  # noqa: F401
from .indexed_dataset import (  # noqa: F401
    AudioIndexedDatasetBuilder,
    FilterBanksDataset,
    IndexedDataset,
    IndexedDatasetBuilder,
    IndexedRawTextDataset,
    MMapIndexedDataset,
    MMapIndexedDatasetBuilder,
    infer_dataset_impl,
    load_indexed_dataset,
    make_builder,
    make_dataset,
)
from . import encoders  # noqa: F401
from .wrappers import (  # noqa: F401
    AppendTokenDataset,
    BaseWrapperDataset,
    IdDataset,
    PrependTokenDataset,
    ResamplingDataset,
    SortDataset,
    StripTokenDataset,
    TruncateDataset,
)
