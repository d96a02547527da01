from .nudger import InterventionHandler
