from .dataset import GraphAdjDataset
from .subiso import (
    edge_subiso_weights,
    enumerate_subisomorphisms,
    node_subiso_weights,
)
from .synthetic import generate_dataset, generate_pair
