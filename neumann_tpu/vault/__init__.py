"""tensor_vault parity: encrypted secrets with graph-edge ACLs."""

from neumann_tpu.vault.anomaly import (  # noqa: F401
    AgentProfile,
    AnomalyEvent,
    AnomalyMonitor,
    AnomalyThresholds,
)
from neumann_tpu.vault.attenuation import (  # noqa: F401
    AttenuationPolicy,
    ExponentialAttenuationPolicy,
)
from neumann_tpu.vault.pki import CertInfo, PkiEngine  # noqa: F401
from neumann_tpu.vault.placement import (  # noqa: F401
    ManifoldPlacer,
    PlacementConfig,
    PlacementRecommendation,
    VaultRegion,
)
from neumann_tpu.vault.scoped import (  # noqa: F401
    DelegationRecord,
    DynamicSecretMeta,
    ImpactReport,
    PasswordConfig,
    RotationPlan,
    ScopedVault,
    SecretTemplate,
    WeightedImpactReport,
    WrappingToken,
)
from neumann_tpu.vault.sync import (  # noqa: F401
    FileSyncTarget,
    GeoCoordinate,
    GeoRouter,
    MemorySyncTarget,
    RoutingConfig,
    SyncTarget,
    TargetGeometry,
    VaultSync,
)
from neumann_tpu.vault.intel import (  # noqa: F401
    AccessTensor,
    AccessTopology,
    AccessTensorConfig,
    GraphIntel,
    HeatKernelTrust,
    SecretSimilarity,
    SecurityAudit,
)
from neumann_tpu.vault.obfuscation import ObfuscationLayer  # noqa: F401
from neumann_tpu.vault.policy import PolicyEngine, PolicyTemplate  # noqa: F401
from neumann_tpu.vault.quota import QuotaManager, ResourceQuota  # noqa: F401
from neumann_tpu.vault.rotation import (  # noqa: F401
    RotationManager,
    RotationPolicy,
)
from neumann_tpu.vault.access import (  # noqa: F401
    AccessController,
    EdgeSigner,
)
from neumann_tpu.vault.vault import TensorVault, Permission  # noqa: F401
