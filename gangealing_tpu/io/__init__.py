from gangealing_tpu.io.torch_import import (
    load_torch_checkpoint, import_state_dict, stn_config_from_args)
