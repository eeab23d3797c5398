from .data import (
    WholeGraph,
    load_label,
    load_supervised,
    load_unsupervised,
    negative_sampling,
    sample_subgraph_by_neighbors,
    sample_subgraph_by_randomwalks,
    save_embeddings,
)
from .driver import train_unc
from .model import DualGraphConv, UNCDMPNN, UNCTrainModel
