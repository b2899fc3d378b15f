from sparkts.kernels.base import (  # noqa: F401
    ConformalIntervals,
    Model,
    norm_ppf,
    residual_sigma,
)
from sparkts.kernels.basic import (  # noqa: F401
    HistoricAverage,
    Naive,
    RandomWalkWithDrift,
    SeasonalNaive,
    SeasonalWindowAverage,
    WindowAverage,
)
from sparkts.kernels.smoothing import (  # noqa: F401
    SeasonalExponentialSmoothing,
    SeasonalExponentialSmoothingOptimized,
    SimpleExponentialSmoothing,
    SimpleExponentialSmoothingOptimized,
)
from sparkts.kernels.constant import (  # noqa: F401
    ConstantModel,
    FailingModel,
    NaNModel,
    ZeroModel,
)
from sparkts.kernels.intermittent import (  # noqa: F401
    ADIDA,
    IMAPA,
    TSB,
    CrostonClassic,
    CrostonOptimized,
    CrostonSBA,
)

from sparkts.kernels.theta import (  # noqa: F401
    AutoTheta,
    DynamicOptimizedTheta,
    DynamicTheta,
    OptimizedTheta,
    Theta,
)
from sparkts.kernels.ets import (  # noqa: F401
    ETS,
    AutoETS,
    Holt,
    HoltWinters,
)
from sparkts.kernels.arima import (  # noqa: F401
    ARIMA,
    AutoARIMA,
    AutoRegressive,
)
from sparkts.kernels.ces import AutoCES  # noqa: F401
from sparkts.kernels.csp import ConformalSeasonalPool  # noqa: F401
from sparkts.kernels.mfles import MFLES, AutoMFLES  # noqa: F401
from sparkts.kernels.tbats import TBATS, AutoTBATS  # noqa: F401
from sparkts.kernels.regression import (  # noqa: F401
    LinearRegression,
    PolynomialRegression,
    Ridge,
    SklearnModel,
)
from sparkts.kernels.ucm import (  # noqa: F401
    UCM,
    LocalLevel,
    LocalLinearTrend,
    SmoothTrend,
)
from sparkts.kernels.mstl import MSTL  # noqa: F401
from sparkts.kernels.garch import ARCH, GARCH  # noqa: F401

ALL_MODELS = [
    "AutoTheta",
    "Theta",
    "OptimizedTheta",
    "DynamicTheta",
    "DynamicOptimizedTheta",
    "Naive",
    "SeasonalNaive",
    "HistoricAverage",
    "RandomWalkWithDrift",
    "WindowAverage",
    "SeasonalWindowAverage",
    "SimpleExponentialSmoothing",
    "SimpleExponentialSmoothingOptimized",
    "SeasonalExponentialSmoothing",
    "SeasonalExponentialSmoothingOptimized",
    "CrostonClassic",
    "CrostonOptimized",
    "CrostonSBA",
    "ADIDA",
    "IMAPA",
    "TSB",
    "AutoETS",
    "ETS",
    "Holt",
    "HoltWinters",
    "AutoARIMA",
    "ARIMA",
    "AutoRegressive",
    "MSTL",
    "GARCH",
    "ARCH",
    "AutoCES",
    "LinearRegression",
    "PolynomialRegression",
    "Ridge",
    "SklearnModel",
    "ConformalSeasonalPool",
    "MFLES",
    "AutoMFLES",
    "TBATS",
    "AutoTBATS",
    "UCM",
    "LocalLevel",
    "LocalLinearTrend",
    "SmoothTrend",
]
