"""Serving/export layer — AOT StableHLO artifacts for deployment.

The reference's deployment story stops at checkpoint reload + timed
inference inside the training process (`basemodel.py:579-599`
``inference_time``, ``:601-722`` ``test``, ``:834-948`` checkpoint CRUD):
a torch process must rebuild the Python model class before it can serve.
The TPU-native analogue exports the eval-mode forward once — weights
embedded as constants, batch dimension symbolic, lowered for TPU and CPU
— so a serving process deserializes and runs the artifact with no model
code, checkpoint, or framework import graph present.
"""

from convnets_tpu.serve.export import (  # noqa: F401
    ServingModel,
    export_model,
    export_trainer,
    load_artifact,
    save_artifact,
)
