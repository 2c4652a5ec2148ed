from larvanet_tpu.core.registry import (
    register_model,
    register_loader,
    get_model,
    get_loader,
    list_models,
    list_loaders,
)
from larvanet_tpu.core.config import (
    ArgChain,
    dump_arguments_json,
)
