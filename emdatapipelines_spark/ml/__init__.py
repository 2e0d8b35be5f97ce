"""ML layer (SURVEY §2.11 M1–M4): MLlib replaces scikit-learn assets."""

from .features import daily_event_features  # noqa: F401
from .forest import train_forest_classifier  # noqa: F401
from .risk import risk_scores  # noqa: F401
