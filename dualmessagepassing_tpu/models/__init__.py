from .basemodel import GraphAdjModelV2, ModelConfig
from .dmpnn import DMPLayer, DMPNNStack
from .scm_models import MODEL_REGISTRY, DMPNN, build_model
