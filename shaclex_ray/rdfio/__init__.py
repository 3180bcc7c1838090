from shaclex_ray.rdfio.turtle import parse_turtle, TurtleError
from shaclex_ray.rdfio.rdfxml import parse_rdfxml, RdfXmlError
from shaclex_ray.rdfio.jsonld import parse_jsonld, JsonLdError
from shaclex_ray.rdfio.rdfjson import parse_rdfjson, RdfJsonError

__all__ = [
    "parse_turtle",
    "TurtleError",
    "parse_rdfxml",
    "RdfXmlError",
    "parse_jsonld",
    "JsonLdError",
    "parse_rdfjson",
    "RdfJsonError",
]
