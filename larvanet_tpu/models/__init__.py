"""Model zoo. Importing this package registers every model under its
reference CLI name (--model=<name>), replacing the reference's
importlib-by-filename plugin loading (reference train.py:53-54)."""

import larvanet_tpu.models.edsr  # noqa: F401
import larvanet_tpu.models.larvanet  # noqa: F401
import larvanet_tpu.models.msrr  # noqa: F401
import larvanet_tpu.models.mamnet  # noqa: F401
import larvanet_tpu.models.ebrn  # noqa: F401
import larvanet_tpu.models.imdn  # noqa: F401
import larvanet_tpu.models.hrsr  # noqa: F401
import larvanet_tpu.models.rego  # noqa: F401
import larvanet_tpu.models.treenet  # noqa: F401
