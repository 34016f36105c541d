export { NeumannRestClient, NeumannRestError } from "./rest";
export type {
  QueryResult,
  Health,
  CollectionConfig,
  Point,
  ScoredPoint,
  Filter,
} from "./rest";
export { NeumannGrpcClient } from "./grpc";
export type { GrpcClientOptions } from "./grpc";
export {
  NeumannGrpcWebClient,
  NeumannGrpcWebError,
} from "./grpcweb";
export type {
  GrpcWebClientOptions,
  WebQueryResult,
  Hit,
} from "./grpcweb";
