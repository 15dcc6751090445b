from convnets_tpu.models.base import Model, Builder, build_model, available_models, register  # noqa: F401
from convnets_tpu.models.blocks import SEUnit, SKConv  # noqa: F401

# Import model files for registration side effects.
from convnets_tpu.models import alexnet  # noqa: F401
from convnets_tpu.models import convnet  # noqa: F401
from convnets_tpu.models import vggnet  # noqa: F401
from convnets_tpu.models import inceptionnet_v1  # noqa: F401
from convnets_tpu.models import resnet  # noqa: F401
from convnets_tpu.models import resnext  # noqa: F401
from convnets_tpu.models import squeezenet  # noqa: F401
from convnets_tpu.models import densenet  # noqa: F401
from convnets_tpu.models import mobilenet_v1  # noqa: F401
from convnets_tpu.models import shufflenet_v1  # noqa: F401
from convnets_tpu.models import senet  # noqa: F401
from convnets_tpu.models import se_resnet  # noqa: F401
from convnets_tpu.models import sknet  # noqa: F401
from convnets_tpu.models import sk_resnet  # noqa: F401
from convnets_tpu.models import template_net  # noqa: F401
