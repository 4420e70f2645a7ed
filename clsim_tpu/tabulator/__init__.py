from .axes import Axis, SphericalAxes, default_spherical_axes  # noqa: F401
from .table import (PhotonTable, ReferenceSource,  # noqa: F401
                    make_reference_source, save_table_npz, tabulate)
