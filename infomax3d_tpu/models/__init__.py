from infomax3d_tpu.models.registry import MODEL_REGISTRY, get_model_class, register_model
from infomax3d_tpu.models.base import (
    MLP, FCLayer, MLPReadout, MaskedBatchNorm, AtomEncoder, BondEncoder,
)
from infomax3d_tpu.models.pna import PNA, PNAGNN, PNALayer
from infomax3d_tpu.models.net3d import Net3D, Net3DDense, Net3DLayer

register_model("PNA")(PNA)
register_model("PNAGNN")(PNAGNN)
register_model("Net3D")(Net3D)
register_model("Net3DDense")(Net3DDense)

from infomax3d_tpu.models.byol import BYOLWrapper, Critic  # noqa: E402
from infomax3d_tpu.models.gin import OGBGNN  # noqa: E402
from infomax3d_tpu.models.egnn import EGNN  # noqa: E402
from infomax3d_tpu.models.net3d_vae import Net3DAE, Net3DDistancePredictor  # noqa: E402
from infomax3d_tpu.models.san import SAN  # noqa: E402
from infomax3d_tpu.models.transformer import (  # noqa: E402
    DistancePredictor, PNADistancePredictor, PNATransformer, TransformerPlain,
)
from infomax3d_tpu.models.pna_original import (  # noqa: E402
    PNAOriginal, PNAOriginalSimple,
)
from infomax3d_tpu.models.pna_random import PNARandom  # noqa: E402
from infomax3d_tpu.models.smp import SMP  # noqa: E402
from infomax3d_tpu.models.geomol_mpnn import (  # noqa: E402
    GeomolGNN, GeomolGNNWrapper, GeomolGNNWrapperOGBFeat,
)
from infomax3d_tpu.models.optimal_transport import OptimalTransportModel  # noqa: E402
from infomax3d_tpu.models.egnn_dense import DenseEGNN  # noqa: E402

__all__ = [
    "MODEL_REGISTRY", "get_model_class", "register_model",
    "MLP", "FCLayer", "MLPReadout", "MaskedBatchNorm", "AtomEncoder",
    "BondEncoder", "PNA", "PNAGNN", "PNALayer", "Net3D", "Net3DLayer",
]
from infomax3d_tpu.models.random_variants import (  # noqa: E402
    GeomolGNNWrapperOGBFeatRandomNonShared, OGBGNNRandom, PNAOriginalRandom,
    PNAOriginalSimpleRandom, PNARandomEdgeUpdate,
)

# reference configs name the critic 'BasicCritic' (models/legacy/basic_critic
# upstream); alias to the active Critic implementation
register_model("BasicCritic")(Critic)
