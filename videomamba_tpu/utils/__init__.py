"""Training-support scaffolding: config, optimizer, scheduler, logging."""
