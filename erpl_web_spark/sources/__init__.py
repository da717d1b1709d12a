"""Source/sink connectors beyond the OData core: HTTP table functions,
Delta Sharing, ODP CDC, Microsoft Graph family."""
