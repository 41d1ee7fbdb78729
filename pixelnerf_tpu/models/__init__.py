from .code import PositionalEncoding  # noqa: F401
from .encoder import ConvEncoder, ImageEncoder, SpatialEncoder, index_latent  # noqa: F401
from .factory import make_encoder, make_mlp, make_model  # noqa: F401
from .mlp import ImplicitNet  # noqa: F401
from .pixelnerf import PixelNeRFNet, SceneEncoding, bake_encoding  # noqa: F401
from .resnetfc import ResnetBlockFC, ResnetFC  # noqa: F401
