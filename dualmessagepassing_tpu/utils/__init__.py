from .act import map_activation_str_to_fn, sparsemax, supported_act_funcs
from .init import calculate_gain, get_initializer, scaled
