from pips_tpu.torchport.convert import convert_pips_state_dict, load_torch_checkpoint

__all__ = ["convert_pips_state_dict", "load_torch_checkpoint"]
