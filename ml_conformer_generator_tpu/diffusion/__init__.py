from .edm import EDMSampler
from .schedule import gamma_schedule, polynomial_schedule
