from .mesh import make_mesh, MeshSpec  # noqa: F401
from .sharded import (  # noqa: F401
    sharded_cwt,
    sharded_power_pipeline,
    sharded_wct,
    sharded_wct_matrix,
    sharded_wct_pairs,
    sharded_mc_histogram,
    sharded_mc_histogram_pairs,
)
from .dist_fft import (sharded_cwt_spectral, sharded_cwt_spectral_planar,  # noqa: F401
                       sharded_dft, sharded_dft_planar, sharded_idft)  # noqa: F401
