from edvr_tpu.convert.torch_import import (convert_state_dict,
                                           load_torch_weights)

__all__ = ['convert_state_dict', 'load_torch_weights']
